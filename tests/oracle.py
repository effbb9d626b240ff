"""Sequential oracle crawler (SURVEY §5.2) — the executable stand-in for
the reference's sequential harvesting loop (§3.1), sharing only the pure
kernels (canonicalize / murmur3 / parse_html) with the engine. What the
parity tests exercise is crawl *scheduling*: wave structure, dedup
winners, politeness spacing, deterministic ordering — everything the
distributed engine could get wrong.

Semantics (the contract both sides implement):
- seen set = every unique canonical URL ever discovered (admission-time,
  including robots-denied / uncrawlable ones so they are never revisited).
- frontier wave k+1 = candidates discovered in wave k that are new,
  robots-allowed, crawlable, within depth/host budgets.
- dedup winner = min (src_part, src_seq, link_idx) per url_hash.
- seq = rank within (wave, part) ordered by (src_part, src_seq, link_idx).
- politeness: per-wave virtual clock; a host's j-th fetch of the wave is
  scheduled at j * crawl_delay_ms(host).
- parse: only status==200 and text/html bodies; links are canonicalized
  against the page URL and deduped in-page preserving first occurrence.
- feed discovery (D1, cfg.discover_feeds): when a host is first admitted
  at wave k, its /sitemap.xml and /rss.xml are fetched during wave k
  (internal metadata fetches — not pages: no fetch-log entry, no seen
  marking, no robots gate on the feed URL itself). Discovered URLs join
  wave k's link candidates with srckey (part(host(url)), FEED_SRC_SEQ,
  idx-in-doc, depth=1) — FEED_SRC_SEQ is the max src_seq, so page-link
  discovery wins dedup ties. sitemap-index children are re-queued as
  wave-k+1 discovery docs. Candidates pass the normal admission filters
  (seen/robots/depth/cap). If the frontier empties, queued discovery
  dies with the crawl (both sides).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from crawlray.functions.canon import canonicalize, host_of, is_crawlable
from crawlray.functions.htmlx import decode_html, parse_html
from crawlray.functions.murmur3 import hash64s
from crawlray.pipelines.config import CrawlConfig, part_of
from crawlray.state.robots import RobotsPolicy


@dataclass
class OracleResult:
    fetch_log: list = field(default_factory=list)  # dict rows
    seen: set = field(default_factory=set)         # canonical URLs
    docs: dict = field(default_factory=dict)       # url_canon -> [span tuples]
    links: dict = field(default_factory=dict)      # url_canon -> [(href, anchor)]
    waves: list = field(default_factory=list)      # frontier size per wave
    versions: dict = field(default_factory=dict)   # url_canon -> lastmod_us
    hosts: set = field(default_factory=set)        # hosts ever admitted
    # conditional-refetch baseline recorded from response headers:
    # url_canon -> (etag, last_modified_us)
    resp_validators: dict = field(default_factory=dict)
    # <link rel=canonical>, resolved against the final URL
    canonicals: dict = field(default_factory=dict)
    # adaptive revisit clock: url_canon -> [due_run, interval]
    revisit: dict = field(default_factory=dict)
    run_idx: int = 0


def crawl_oracle(seed_urls, robots: RobotsPolicy, pages_index: dict,
                 cfg: CrawlConfig, prior: OracleResult | None = None) -> OracleResult:
    """pages_index: url_canon -> (status, content_type, body, latency_ms).
    3xx rows (body = Location) are followed exactly like the engine's
    transports (same follow_redirects helper); docs are stored under the
    FINAL canonical url and redirect finals are marked seen at the next
    admission before any candidate is considered.

    ``prior``: a previous run's OracleResult — the refresh-crawl mirror
    (engine: run_crawl(prior_run_dir=...)): its seen set, version store
    and host list carry over; with cfg.refetch_if_newer a feed candidate
    whose stamp is strictly newer than the recorded version re-admits."""
    from crawlray.sources.feeds import lastmod_to_us
    from crawlray.sources.transport import (
        NO_LASTMOD, follow_redirects, validators_match,
    )
    from crawlray.stages.parse import retry_after_ms

    res = OracleResult()
    host_pages: dict[str, int] = {}  # admitted per host (cap budget)
    refetch_on = bool(getattr(cfg, "refetch_if_newer", False))
    adaptive = int(getattr(cfg, "adaptive_revisit", 0) or 0)
    NEVER_DUE = 1 << 62
    prior_hosts: set[str] = set()
    if prior is not None:
        res.seen = set(prior.seen)
        res.versions = dict(prior.versions)
        prior_hosts = set(prior.hosts)
        res.resp_validators = dict(prior.resp_validators)
        res.run_idx = prior.run_idx + 1
        if adaptive:
            # engine mirror (_fold_revisit): the prior run's parked store
            # updated with its fetch outcomes — 304 doubles the interval
            # up to the cap, 200 resets to 1; due = prior_run_idx + iv
            res.revisit = {u: list(v) for u, v in prior.revisit.items()}
            outcomes: dict[str, bool] = {}
            for r in prior.fetch_log:
                if r["status"] == 200:
                    outcomes[r["url_canon"]] = True
                elif (r["status"] == 304
                      and r["url_canon"] not in outcomes):
                    outcomes[r["url_canon"]] = False
            for u, changed in outcomes.items():
                prev_iv = res.revisit.get(u, (0, 1))[1]
                iv = 1 if changed else min(prev_iv * 2, adaptive)
                res.revisit[u] = [prior.run_idx + iv, iv]
    # M2 host allowlist (engine: policy_mask / admit_seeds): off-list
    # urls are seen-marked but never fetched
    allowed_set = (set(cfg.allowed_hosts)
                   if getattr(cfg, "allowed_hosts", None) else None)

    def fetch(u, cond=None):
        """(status, ctype, body, latency_total, final_url, etag,
        lastmod_us) — redirect chains followed through the raw pages
        index; with a validator ``cond`` from the recorded baseline, an
        unchanged 200 revalidates as a 304 with an empty body (same
        validators_match kernel as the engine's transports)."""
        status, ctype, body, lat, final = follow_redirects(
            lambda x: pages_index.get(x, (404, "text/html", b"", 5.0))[:4], u)
        row = pages_index.get(final)
        etag, lastmod = ((row[4], row[5]) if row is not None and len(row) > 4
                         else (None, NO_LASTMOD))
        if (status == 200 and cond is not None
                and validators_match(cond[0], cond[1], etag, lastmod)):
            return 304, ctype, b"", lat, final, etag, lastmod
        return status, ctype, body, lat, final, etag, lastmod

    ext_cache: dict[str, object] = {}

    def extractor_for(host: str):
        """§2.10: same per-site extractor registry as the engine."""
        fn = ext_cache.get(host)
        if fn is None:
            from crawlray.functions.extractors import resolve

            fn = resolve(host, getattr(cfg, "extractors", None))
            ext_cache[host] = fn
        return fn

    def admit(candidates, finals=(), forced=()):
        """candidates: [(url_canon, src_part, src_seq, link_idx, depth,
        lastmod_us)] → next frontier rows, applying dedup/seen/robots/
        crawlable/budgets. ``finals``: redirect final urls whose bodies
        are already stored — marked seen FIRST (engine:
        mark_redirect_finals before the novelty pass) so no candidate
        for them is ever admitted. Refresh mirror: decisions use the
        versions recorded through the PREVIOUS wave; this wave's
        observed stamps update the store only at the end (engine:
        builder groups read versions_ref, the driver merges fragments
        after the wave barrier)."""
        for f in finals:
            res.seen.add(f)
        best: dict[str, tuple] = {}
        stamps: dict[str, int] = {}  # wave-max observed stamp per url
        for url, sp, ss, li, depth, lm in candidates:
            key = (sp, ss, li)
            if url not in best or key < best[url][0]:
                best[url] = (key, depth)
            if lm >= 0 and lm > stamps.get(url, -1):
                stamps[url] = lm
        rows = []
        # admission iterates in srckey order — the per-host page cap must
        # consume budget deterministically (engine sorts by srckey too)
        for url in sorted(best, key=lambda u: best[u][0]):
            if url in res.seen and url not in forced:
                # refresh re-admission: strictly-newer stamp than the
                # RECORDED version (urls without a baseline never
                # refetch). ``forced``: Retry-After retries bypass the
                # seen check (engine: seen_only=2 force channel).
                # Adaptive revisit: a DUE clock re-admits too (engine:
                # refetch_overrides' revisit channel)
                if not (refetch_on and url in res.versions
                        and stamps.get(url, -1) > res.versions[url]):
                    if not (adaptive
                            and res.revisit.get(url, (NEVER_DUE,))[0]
                            <= res.run_idx):
                        continue
            res.seen.add(url)
            key, depth = best[url]
            if (depth > cfg.max_depth
                    or not is_crawlable(url, allowed_hosts=allowed_set)
                    or not robots.allowed(url)):
                continue
            host = host_of(url)
            if host_pages.get(host, 0) >= cfg.max_pages_per_host:
                continue
            host_pages[host] = host_pages.get(host, 0) + 1
            part = part_of(hash64s(host) & 0xFFFFFFFFFFFFFFFF, cfg.n_parts)
            rows.append({"url_canon": url, "host": host, "part": part,
                         "depth": depth, "srckey": key})
        # observation defines the version — recorded for EVERY candidate
        # with a stamp (admitted or not), AFTER all decisions (engine:
        # fold_versions pre-dedup, driver merge post-wave)
        for url, lm in stamps.items():
            if lm > res.versions.get(url, -1):
                res.versions[url] = lm
        # seq: rank within part by srckey
        rows.sort(key=lambda r: (r["part"], r["srckey"]))
        seq_in_part: dict[int, int] = {}
        for r in rows:
            r["seq"] = seq_in_part.get(r["part"], 0)
            seq_in_part[r["part"]] = r["seq"] + 1
            # engine mirror (_spend_revisit): a url that reaches a
            # frontier revisits at most once per run — park the entry,
            # keep the interval for the next run's fold
            if adaptive and r["url_canon"] in res.revisit:
                res.revisit[r["url_canon"]][0] = NEVER_DUE
        return rows

    def discover(doc_urls, pending_next):
        """Feed-discovery candidates for one wave: runs the SAME parser
        stage (feeds.discover_batch) the engine uses over the discovery
        docs, mirroring feed_candidates' srckey packing."""
        import pyarrow as pa

        from crawlray.sources.feeds import FEED_SRC_SEQ, discover_batch

        out = []
        for src in doc_urls:
            status, ctype, body, _lat, _final, _e, _lm = fetch(src)
            rows = discover_batch(pa.table({
                "url_canon": pa.array([src], type=pa.string()),
                "content_type": pa.array([ctype], type=pa.string()),
                "body": pa.array([body or b""], type=pa.binary()),
            })).to_pylist()
            for r in rows:
                if r["via"] == "sitemap_index":
                    pending_next.append(r["url"])
                    continue
                cu = canonicalize(r["url"], base=src)
                if not cu:
                    continue
                h = host_of(cu)
                if not h:
                    continue
                p = part_of(hash64s(h) & 0xFFFFFFFFFFFFFFFF, cfg.n_parts)
                out.append((cu, p, FEED_SRC_SEQ, min(int(r["idx"]), 65535), 1,
                            lastmod_to_us(r["lastmod"])))
        return out

    disco_done: set[str] = set()
    pending_disco: list[str] = []

    robots_known: set[str] = set()

    def ensure_robots(hosts):
        """robots_mode='fetch' mirror: fetch+parse /robots.txt for hosts
        first entering a frontier; late rules re-filter the wave below
        (denied rows stay seen, are never fetched) — same spec as the
        engine's _ensure_robots + HostScheduler re-check."""
        from crawlray.state.robots import (
            DEFAULT_UA, parse_robots_sitemaps, parse_robots_txt,
        )

        for h in sorted(set(hosts) - robots_known):
            status, _c, body, _l, _f, _e, _lm = fetch(f"https://{h}/robots.txt")
            if status == 200 and body:
                robots_known.add(h)
                txt = bytes(body).decode("utf-8", errors="replace")
                a, d, ms = parse_robots_txt(txt, DEFAULT_UA,
                                            cfg.default_delay_ms)
                robots.add_rows([{"host": h, "allow": a, "deny": d,
                                  "crawl_delay_ms": ms,
                                  "sitemaps": parse_robots_sitemaps(txt)}])
            elif status >= 500 or status <= 0:
                # unreachable robots (RFC 9309): temporary deny-all, NOT
                # marked known — the next wave retries (engine mirror)
                robots.add_rows([{"host": h, "allow": [], "deny": ["/"],
                                  "crawl_delay_ms": cfg.default_delay_ms,
                                  "fetched_ok": False}])
            else:
                robots_known.add(h)
                robots.add_rows([{"host": h, "allow": [], "deny": [],
                                  "crawl_delay_ms": cfg.default_delay_ms}])

    frontier = admit([(canonicalize(u), 0, 0, i, 0, -1)
                      for i, u in enumerate(seed_urls) if canonicalize(u)])
    drift_ms: dict[str, int] = {}

    def eff_delay(host: str) -> int:
        """Politeness-drift mirror: spacing = max(robots crawl-delay,
        drift floor from the PREVIOUS wave's mean measured latency)."""
        return max(robots.crawl_delay_ms(host), drift_ms.get(host, 0))

    wave = 0
    feeds_on = getattr(cfg, "discover_feeds", False)

    def disco_pending() -> bool:
        """Engine's has_disco mirror: queued sitemap-index children, or
        hosts (admitted OR carried from a prior run) not yet probed."""
        return bool(feeds_on and (
            pending_disco or ((set(host_pages) | prior_hosts) - disco_done)))

    while wave < cfg.max_waves:
        if not frontier and not disco_pending():
            break
        if getattr(cfg, "robots_mode", "table") == "fetch":
            ensure_robots({r["host"] for r in frontier})
            frontier = [r for r in frontier if robots.allowed(r["url_canon"])]
            if not frontier and not disco_pending():
                break
        # politeness virtual clock per wave, per host, in (part, seq) order
        frontier.sort(key=lambda r: (r["part"], r["seq"]))
        host_j: dict[str, int] = {}
        lat_sums: dict[str, list] = {}
        pen_wave: dict[str, int] = {}
        forced_next: set[str] = set()
        candidates = []
        redirect_finals: list[str] = []
        # conditional-refetch baseline snapshot at wave start (engine:
        # validators_ref is ray.put once per wave, merged post-wave)
        wave_validators = (dict(res.resp_validators) if refetch_on else {})
        for r in frontier:
            j = host_j.get(r["host"], 0)
            host_j[r["host"]] = j + 1
            sched = float(j * eff_delay(r["host"]))
            status, ctype, body, lat, final_raw, etag, lastmod = fetch(
                r["url_canon"],
                cond=wave_validators.get(r["url_canon"]) if refetch_on
                else None)
            if status in (200, 304) and (etag is not None or lastmod >= 0):
                res.resp_validators[r["url_canon"]] = (etag, lastmod)
            final = canonicalize(final_raw) or r["url_canon"]
            if final != r["url_canon"]:
                redirect_finals.append(final)
            acc = lat_sums.setdefault(r["host"], [0.0, 0])
            acc[0] += float(lat)
            acc[1] += 1
            # RFC 9110 Retry-After mirror (engine: PageParser column +
            # ParseAndSink._fold_penalty): 429/503 delay-seconds → max
            # per host, raising the next wave's politeness floor
            ra = retry_after_ms(int(status), body)
            if ra >= 0 and ra > pen_wave.get(r["host"], -1):
                pen_wave[r["host"]] = ra
            if (int(status) in (429, 503)
                    and getattr(cfg, "retry_rate_limited", False)):
                # retry half: re-admit the throttled URL next wave at its
                # own depth, bypassing the seen set (engine: retry_url →
                # seen_only=2 force channel)
                candidates.append((r["url_canon"], r["part"], r["seq"],
                                   0, r["depth"], -1))
                forced_next.add(r["url_canon"])
            res.fetch_log.append(
                {
                    "wave": wave,
                    "part": r["part"],
                    "host": r["host"],
                    "seq": r["seq"],
                    "url_canon": r["url_canon"],
                    "url_hash": hash64s(r["url_canon"]),
                    "scheduled_ms": sched,
                    "status": int(status),
                }
            )
            if status == 200 and str(ctype).startswith("text/html"):
                page = extractor_for(r["host"])(decode_html(body, ctype))
                # M10 content-language gate mirror: outside-set pages
                # keep their fetch-log row, store nothing, discover
                # nothing (engine: PageParser blanks the row). noindex
                # pages carry no spans, so the gate never sees them.
                keep_langs = getattr(cfg, "keep_languages", None)
                if keep_langs and not page.noindex and page.spans:
                    from crawlray.functions.textstats import lang_id

                    text = " ".join(t for k, t, _m in page.spans
                                    if k == "text" and t)
                    if lang_id([text])[0] not in keep_langs:
                        continue
                # robots-meta mirror: noindex stores no content (links
                # still discovered); nofollow discovers no links
                # (content still stored); rel=canonical is recorded as
                # metadata, resolved against the final URL
                if page.canonical:
                    cc = canonicalize(page.canonical, base=final)
                    if cc:
                        res.canonicals[final] = cc
                if not page.noindex:
                    res.docs[final] = [
                        (k, t, m, i)
                        for i, (k, t, m) in enumerate(page.spans)
                    ]
                links, seen_in_page = [], set()
                if not page.nofollow:
                    for href, anchor in page.links:
                        cu = canonicalize(href, base=final)
                        if cu and cu not in seen_in_page:
                            seen_in_page.add(cu)
                            links.append((cu, anchor))
                # anchor text is retained per doc (first occurrence of a
                # canonical URL keeps its anchor — same winner as dedup)
                res.links[final] = list(links)
                for li, (cu, _a) in enumerate(links):
                    candidates.append(
                        (cu, r["part"], r["seq"], li, r["depth"] + 1, -1))
        if feeds_on:
            # hosts first admitted by wave ≤ k (host_pages keys, plus a
            # prior run's carried hosts) minus those already probed ==
            # hosts first probed at wave k — identical to the engine's
            # (budgets ∪ prior_hosts) - disco_done difference
            new_hosts = sorted((set(host_pages) | prior_hosts) - disco_done)
            disco_done.update(new_hosts)
            # robots-declared Sitemap: URLs ∪ defaults (engine mirror)
            doc_urls = list(pending_disco)
            probed = set(doc_urls)
            for h in new_hosts:
                for u in (*robots.sitemaps_for(h),
                          f"https://{h}/sitemap.xml",
                          f"https://{h}/rss.xml"):
                    if u not in probed:
                        probed.add(u)
                        doc_urls.append(u)
            pending_disco = []
            candidates.extend(discover(doc_urls, pending_disco))
        if not frontier and not candidates:
            # discovery-only wave that discovered nothing admittable —
            # engine: _wave_discovery returned None, no admission
            # shuffle, no wave metric
            break
        res.waves.append(len(frontier))
        if getattr(cfg, "politeness_drift", False):
            drift_ms = {
                h: int(round(cfg.drift_factor * s / n))
                for h, (s, n) in lat_sums.items() if n
            }
        if (getattr(cfg, "politeness_drift", False)
                or getattr(cfg, "schedule_mode", "") == "wave_start"):
            # Retry-After penalties ride the same floor channel as drift
            # (engine: crawl.py post-wave merge); penalty-only floors
            # reset each wave
            if not getattr(cfg, "politeness_drift", False):
                drift_ms = {}
            for h, ms in pen_wave.items():
                if ms > drift_ms.get(h, 0):
                    drift_ms[h] = ms
        frontier = admit(candidates, finals=redirect_finals,
                         forced=forced_next)
        wave += 1
    res.hosts = set(host_pages) | prior_hosts
    return res


def build_pages_index(pages_table) -> dict:
    """url → (status, ctype, body, latency[, etag, last_modified_us])
    — validator fields appended when the fixture table declares them
    (conditional-refetch fixtures); plain tables stay 4-tuples."""
    cols = pages_table.column_names
    base = zip(
        pages_table["url"].to_pylist(),
        pages_table["status"].to_pylist(),
        pages_table["content_type"].to_pylist(),
        pages_table["html"].to_pylist(),
        pages_table["latency_ms"].to_pylist(),
    )
    if "etag" not in cols and "last_modified_us" not in cols:
        return {u: (s, c, h, l) for u, s, c, h, l in base}
    n = pages_table.num_rows
    etags = (pages_table["etag"].to_pylist() if "etag" in cols
             else [None] * n)
    lastmods = (pages_table["last_modified_us"].to_pylist()
                if "last_modified_us" in cols else [-1] * n)
    return {
        u: (s, c, h, l, e, -1 if lm is None else int(lm))
        for (u, s, c, h, l), e, lm in zip(base, etags, lastmods)
    }
