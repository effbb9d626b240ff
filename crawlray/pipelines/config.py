"""Crawl configuration — single source of the knobs both the engine and
the sequential oracle consume, so parity runs share exact semantics."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class CrawlConfig:
    # partitioning
    n_parts: int = 8                 # P: host_hash % P frontier partitions
    seen_shards: int = 8             # S: cuckoo seen-set shard actors
    seen_capacity: int = 1 << 20     # per-shard filter capacity (items)
    # budgets (reference politeness semantics)
    max_depth: int = 4
    max_waves: int = 8
    max_pages_per_host: int = 10_000
    default_delay_ms: int = 1000     # crawl-delay when robots has none
    # D1: when a host is first admitted, fetch its /sitemap.xml and
    # /rss.xml during that wave and union the discovered URLs into the
    # same admission shuffle as page links (sitemap-index children are
    # re-queued for the next wave). A host without feeds costs two 404s.
    discover_feeds: bool = True
    # discovery execution switch: waves probing ≤ this many feed URLs
    # run as chunked plain tasks (cheap); bigger waves run the full
    # Dataset pipeline whose parsed rows go through a wave-scoped
    # parquet SIDE-WRITE (manifest sink) instead of an object-store
    # materialize — the 10^9-feed-entries shape. 0 forces the side-write
    # path (used by parity tests).
    disco_inline_limit: int = 4096
    # Refresh / re-crawl scheduling (the reference's steady-state mode is
    # incremental harvesting): when on, a feed/sitemap candidate whose
    # pubDate/lastmod is STRICTLY newer than the recorded version for
    # that URL is re-admitted even though it is in the seen set, so a
    # refresh run (run_crawl(..., prior_run_dir=...)) re-fetches exactly
    # the updated pages. URLs with no recorded stamp never refetch; every
    # run records observed stamps as the next run's baseline (the
    # versions/ store).
    refetch_if_newer: bool = False
    # Adaptive revisit scheduling (Cho & Garcia-Molina 2003, "Effective
    # page refresh policies for web crawlers"): value = max revisit
    # interval in RUNS (0 = off). When on, a refresh run ALSO re-admits
    # stampless seen URLs whose revisit clock is due: every fetched URL
    # starts at interval 1 (refetch next run); a revisit that comes back
    # UNCHANGED (304 via the recorded validators) doubles the interval
    # up to this cap, a changed one (200) resets it to 1 — so static
    # pages back off exponentially while live pages stay fresh. The
    # clock (url_hash -> [due_run, interval]) and the run's chain
    # position (run_idx) ride the per-wave state commits; the next run
    # folds them with this run's observed outcomes at chain time.
    # Requires refetch_if_newer (the stamp rule stays the primary,
    # cheaper signal; this covers the stampless remainder).
    adaptive_revisit: int = 0
    # M2 host allow-policy (the reference crawls a CLOSED set of news
    # domains): when set, only exact-match hosts are ever fetched.
    # Cross-host links to other domains are still admitted to the seen
    # set (discovery marks, dedup stays exact) but the policy gate drops
    # them before the frontier — the engine never walks off the list.
    # None = open crawl (every http(s) host).
    allowed_hosts: tuple | None = None
    # M10 content-language gate (the reference's optional Dutch-news
    # heuristic): when set, a fetched page whose stopword-heuristic
    # language (functions/textstats.lang_id over its text spans) is not
    # in the set keeps its fetch-log row but stores NO content — title/
    # spans/links blank, so its outlinks are never discovered. The
    # detected language rides as a `lang` column in the pages sink.
    # None = store everything.
    keep_languages: tuple | None = None
    # RFC 9110 Retry-After, retry half: when on, a 429/503 response's
    # URL is RE-ADMITTED next wave (seen-set bypass via the force
    # channel, seen_only=2) and fetched again under the raised
    # politeness floor (the penalty half is always on in wave_start
    # mode). Off by default: re-fetching is a budget decision — the
    # fetch-log keeps the 429 row either way.
    retry_rate_limited: bool = False
    # §2.10 per-site extraction rules: {host_pattern: extractor NAME}
    # (names resolved in functions/extractors.EXTRACTORS; exact host or
    # dot-suffix patterns, longest wins; unmatched hosts parse generic)
    extractors: dict = field(default_factory=dict)
    # skew handling: a host is "hot" (gets the salted two-stage frontier
    # build) only when BOTH hold — it has enough pending URLs to matter
    # (absolute threshold) AND it alone carries more than hot_skew_factor
    # × an average part's share of the wave (relative skew: salting buys
    # nothing unless one host's dedup group would straggle the wave, and
    # it costs a second, admitted-rows-only shuffle)
    hot_host_threshold: int = 512
    hot_skew_factor: float = 2.0
    hot_salt_parts: int = 4          # spread a hot host's dedup work over m salt groups
    # frontier files are written in small chunks so the next wave's read
    # splits every part's work across the pool at file granularity
    # (override_num_blocks) — no repartition all-to-all needed
    frontier_rows_per_file: int = 8192
    # execution
    fetch_batch_size: int = 256
    parse_batch_size: int = 512
    fetch_concurrency: tuple = (2, 8)
    parse_concurrency: tuple = (2, 8)
    # per-stage CPU reservations: fractional so the FOUR actor pools of
    # the single wave pipeline (fetch, parse+sink, novelty, seq) can all
    # hold their minimum actor alongside read/shuffle TASKS even on a
    # 4-CPU node — integer minimums pin every core and the streaming
    # executor deadlocks (nothing left for the read stage).
    fetch_num_cpus: float = 0.5
    parse_num_cpus: float = 1.0
    novelty_num_cpus: float = 0.25
    seq_num_cpus: float = 0.5
    # politeness clock placement: "write" stamps scheduled_ms when the
    # frontier is written (one less shuffle per wave; exact for
    # deterministic transports). "wave_start" re-derives it per wave via
    # HostScheduler — the live-HTTP path, where measured fetch times can
    # drift from the written clock between waves.
    schedule_mode: str = "write"
    # robots policy source: "table" consumes a pre-parsed robots table
    # (the fast path); "fetch" fetches+parses /robots.txt per host
    # through the transport as hosts are first admitted (S2 — the
    # reference's behavior). Fetch mode REQUIRES schedule_mode
    # "wave_start": rules can arrive after a host's rows were admitted
    # under the default policy, and the wave-start scheduler is where
    # the fresh policy re-filters rows and re-derives the clock.
    robots_mode: str = "table"
    # politeness drift feedback (A2 live-HTTP refinement): when on, each
    # wave folds per-host MEASURED fetch latency (inside the parse stage,
    # batch-keyed for retry idempotence) and the next wave's scheduler
    # spaces a host's fetches at max(crawl_delay, drift_factor × mean
    # latency of the previous wave). Requires schedule_mode='wave_start'
    # (the clock must be re-derived with the fresh means). Deterministic
    # given integral latencies: float sums of integral ms are exact in
    # any accumulation order.
    politeness_drift: bool = False
    drift_factor: float = 2.0
    # io
    transport: dict = field(default_factory=dict)  # see sources.transport.make_transport

    def __post_init__(self):
        # normalize to a sorted tuple: hashable, deterministic, and
        # cheaply serialized into every frontier-build actor
        if self.allowed_hosts is not None:
            self.allowed_hosts = tuple(sorted(set(self.allowed_hosts)))
        if self.keep_languages is not None:
            self.keep_languages = tuple(sorted(set(self.keep_languages)))
        # a typo here would silently fall back to "write" behavior in the
        # wave loop — fail loudly instead (ADVICE r1)
        if self.schedule_mode not in ("write", "wave_start"):
            raise ValueError(
                f"schedule_mode must be 'write' or 'wave_start', "
                f"got {self.schedule_mode!r}"
            )
        if self.robots_mode not in ("table", "fetch"):
            raise ValueError(
                f"robots_mode must be 'table' or 'fetch', got {self.robots_mode!r}"
            )
        if self.robots_mode == "fetch" and self.schedule_mode != "wave_start":
            raise ValueError(
                "robots_mode='fetch' requires schedule_mode='wave_start' "
                "(late-arriving rules re-filter at wave start)"
            )
        if self.refetch_if_newer and not self.discover_feeds:
            raise ValueError(
                "refetch_if_newer requires discover_feeds (the refresh "
                "signal IS the feed/sitemap stamp)"
            )
        if self.adaptive_revisit and not self.refetch_if_newer:
            raise ValueError(
                "adaptive_revisit requires refetch_if_newer (it extends "
                "the refresh admission to stampless URLs)"
            )
        if self.politeness_drift and self.schedule_mode != "wave_start":
            raise ValueError(
                "politeness_drift requires schedule_mode='wave_start' "
                "(the clock is re-derived with the measured means)"
            )


def part_of(host_hash_u64: int, n_parts: int) -> int:
    """Partition of a host. Uses the *unsigned* view of the int64 hash so
    python and numpy paths agree."""
    return int(host_hash_u64 & 0xFFFFFFFFFFFFFFFF) % n_parts


def config_for_scale(expected_urls: int, total_cpus: int,
                     n_nodes: int = 1, **overrides) -> CrawlConfig:
    """Size a CrawlConfig for a target frontier — the 10^10-URL
    parameter math, executable instead of prose:

    - ``n_parts`` = 4 × total CPUs (≥ 2× parallelism headroom per the
      shuffle-width rule in SURVEY §4.2; capped at 65,536 so part
      metadata stays trivially small).
    - ``seen_shards`` = 2 per node, capped at 256: each shard is one
      named actor — two per node spreads the membership round-trips
      without per-actor queueing, and 256 shards × a 10^10-item
      frontier = 3.9×10^7 items/shard.
    - ``seen_capacity`` per shard = 1.3 × expected_urls / shards,
      rounded up to a power of two (partial-key cuckoo filters degrade
      past ~95% load; 1/1.3 ≈ 77%). At 10^10 URLs / 256 shards →
      capacity 2^26 per shard ≈ 134 MB of uint16 buckets — fits any
      node comfortably; the EXACT spill-set used for parity audits is
      disabled at this scale by the same flag the engine already
      honors.
    - ``frontier_rows_per_file`` stays 8,192 (read-time block split is
      per-file; more files = finer scheduling, and 10^10/8,192 ≈ 1.2M
      files per full frontier spread over wave/part dirs is well inside
      object-store listing budgets).

    Only sizing fields are derived; everything else keeps its default
    unless overridden."""
    shards = max(2, min(256, 2 * n_nodes))
    cap = 1
    while cap < 1.3 * expected_urls / shards:
        cap <<= 1
    return CrawlConfig(
        n_parts=min(65_536, max(8, 4 * total_cpus)),
        seen_shards=shards,
        seen_capacity=cap,
        fetch_concurrency=(max(2, total_cpus // 2), max(4, total_cpus)),
        parse_concurrency=(max(2, total_cpus // 2), max(4, total_cpus)),
        **overrides,
    )
