"""M5–M11 + M8: parse/extract stage — actor pool producing the per-wave
pages table: crawl metadata + interleaved spans + canonical out-links.

One parse pass per page; the wave's parquet checkpoint of this output is
the fork point for BOTH the docs sink and next-wave frontier discovery
(column-pruned re-reads instead of re-executing fetch+parse — the
disk-backed fork that keeps the pipeline streaming at scale).

Output columns: frontier keys (url_canon/url_hash/host/part/wave/seq/
depth/scheduled_ms) + status/content_type/latency_ms + doc payload
(title, published, spans list<struct>, links list<string>). ``body`` is
DROPPED here — it never flows further.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.canon import canonicalize
from ..functions.htmlx import decode_html
from ..functions.spans import spans_to_arrow
from ..schemas import SPAN

MAX_LINKS_PER_PAGE = 65535  # link_idx must fit the 16-bit srckey field


def retry_after_ms(status: int, body) -> int:
    """RFC 9110 §10.2.3 Retry-After (delay-seconds form) on rate-limit /
    unavailable responses: the transports surface the header value as
    the (otherwise unused) body of the 429/503 — the same channel 3xx
    responses use for Location. Shared by the engine's penalty fold and
    the sequential oracle. -1 = no penalty."""
    if status in (429, 503) and body:
        try:
            return int(round(float(
                bytes(body).decode("ascii", "replace").strip()) * 1000.0))
        except ValueError:
            return -1
    return -1


class PageParser:
    """M5–M11 + §2.10: per-site extractor registry — hosts matching a
    configured pattern parse through their registered extractor (resolved
    ONCE per host, memoized per actor); everything else uses the generic
    parser. The oracle resolves through the same registry, so custom
    rules stay parity-checked."""

    def __init__(self, extractors: dict[str, str] | None = None,
                 keep_languages: tuple | None = None):
        self._extractors_cfg = extractors or {}
        self._by_host: dict[str, object] = {}
        # M10 content-language gate: parsed pages outside the set keep
        # their fetch-log row but store no content (title/spans/links
        # blank — outlinks never discovered); None = keep everything
        self._keep_langs = (frozenset(keep_languages)
                            if keep_languages else None)

    def _extractor(self, host: str):
        fn = self._by_host.get(host)
        if fn is None:
            from ..functions.extractors import resolve

            fn = resolve(host, self._extractors_cfg)
            self._by_host[host] = fn
        return fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        statuses = batch["status"].to_pylist()
        ctypes = batch["content_type"].to_pylist()
        bodies = batch["body"].to_pylist()
        # relative links resolve against the FINAL location of the page
        # (RFC 9110: the content lives at the redirect target) — fall
        # back to the requested url when the fetch stage didn't run
        urls = (batch["final_url"] if "final_url" in batch.column_names
                else batch["url_canon"]).to_pylist()
        hosts = batch["host"].to_pylist()
        titles: list[str | None] = []
        published: list = []
        all_spans: list[list] = []
        all_links: list[list[str]] = []
        all_anchors: list[list[str]] = []
        canonicals: list[str | None] = []
        for url, host, st, ct, body in zip(urls, hosts, statuses, ctypes, bodies):
            if st == 200 and (ct or "").startswith("text/html") and body:
                # charset-sniffed decode BEFORE the extractor (header
                # param → meta prescan → UTF-8), shared with the oracle
                page = self._extractor(host)(decode_html(body, ct))
                # <link rel=canonical> resolves against the final URL
                # and rides the pages sink as metadata (a dedup/index
                # signal — NOT a discovery channel; documented choice,
                # mirrored by the oracle)
                canonicals.append(canonicalize(page.canonical, base=url)
                                  if page.canonical else None)
                if page.noindex:
                    # robots-meta noindex: fetch-log row survives,
                    # content does not; links still discoverable
                    # (unless nofollow also set)
                    titles.append(None)
                    published.append(None)
                    all_spans.append([])
                else:
                    titles.append(page.title)
                    published.append(page.published)
                    all_spans.append(page.spans)
                # anchors ride PARALLEL to links (same index): the
                # reference keeps link text rows; a struct column here
                # would force the discovery projection to re-shape, and
                # the anchor never needs to enter the frontier shuffle —
                # it stays in the pages sink only. First occurrence of a
                # canonical URL keeps its anchor (same winner as dedup).
                links: list[str] = []
                anchors: list[str] = []
                seen_in_page: set[str] = set()
                if not page.nofollow:
                    for href, anchor in page.links:
                        cu = canonicalize(href, base=url)
                        if cu and cu not in seen_in_page:
                            seen_in_page.add(cu)
                            links.append(cu)
                            anchors.append(anchor)
                            if len(links) >= MAX_LINKS_PER_PAGE:
                                break
                all_links.append(links)
                all_anchors.append(anchors)
            else:
                canonicals.append(None)
                titles.append(None)
                published.append(None)
                all_spans.append([])
                all_links.append([])
                all_anchors.append([])
        langs: list[str | None] = [None] * len(urls)
        if self._keep_langs is not None:
            from ..functions.textstats import lang_id

            parsed_idx = [i for i, sp in enumerate(all_spans) if sp]
            texts = [
                " ".join(t for k, t, _m in all_spans[i]
                         if k == "text" and t)
                for i in parsed_idx
            ]
            for i, lang in zip(parsed_idx, lang_id(texts)):
                langs[i] = lang
                if lang not in self._keep_langs:
                    # gated: fetch-log row survives, content does not
                    titles[i] = None
                    published[i] = None
                    all_spans[i] = []
                    all_links[i] = []
                    all_anchors[i] = []
        out = batch.drop_columns(["body"])
        out = out.append_column(
            "retry_after_ms",
            pa.array([retry_after_ms(st, body)
                      for st, body in zip(statuses, bodies)],
                     type=pa.int64()))
        if self._keep_langs is not None:
            out = out.append_column("lang",
                                    pa.array(langs, type=pa.string()))
        out = out.append_column("canonical",
                                pa.array(canonicals, type=pa.string()))
        out = out.append_column("title", pa.array(titles, type=pa.string()))
        out = out.append_column("published", pa.array(published, type=pa.timestamp("us")))
        out = out.append_column("spans", spans_to_arrow(all_spans))
        out = out.append_column("links", pa.array(all_links, type=pa.list_(pa.string())))
        out = out.append_column(
            "link_anchors", pa.array(all_anchors, type=pa.list_(pa.string())))
        return out


class ParseAndSink:
    """Parse stage fused with the pages sink: each parsed batch is
    appended to the wave's pages directory as its own fragment file, and
    only the tiny discovery projection (part, seq, depth, links) flows on
    to the dedup shuffle.

    This collapses the naive two-pipeline wave (fetch→parse→write, then
    re-read→discover) into ONE streaming pipeline — the fork the Dataset
    API can't express becomes a per-batch side-effect write. Fragment
    names are DETERMINISTIC per logical batch — a hash of the batch's
    (part, seq) row identities, which are unique within a wave — so a
    mid-wave task retry / lineage reconstruction OVERWRITES the original
    fragment instead of appending a duplicate (an in-run retry would
    otherwise commit both copies at wave end and inflate the docs view;
    ADVICE r1). Resume additionally discards uncommitted wave dirs before
    replay. The driver stamps the lance-compat manifest after the wave
    completes (atomic tmp+rename per fragment: a fragment killed mid-write
    never surfaces as a committed .parquet)."""

    def __init__(self, pages_dir: str, extractors: dict[str, str] | None = None,
                 stats=None, wave: int = -1, validators_dir: str | None = None,
                 keep_languages: tuple | None = None,
                 fold_latency: bool = True,
                 retry_rate_limited: bool = False):
        os.makedirs(pages_dir, exist_ok=True)
        self._dir = pages_dir
        self._parse = PageParser(extractors, keep_languages=keep_languages)
        self._stats = stats   # politeness-drift latency fold (WaveStats)
        self._fold_lat = fold_latency  # False: stats is penalty-only
        self._retry = retry_rate_limited
        self._wave = wave
        # conditional-refetch baseline: responses bearing ETag /
        # Last-Modified are recorded (url_hash → validators) as a
        # side-write the driver merges post-wave — same idempotence
        # contract as the pages sink (deterministic fragment names)
        self._validators_dir = validators_dir

    def _fold_latency(self, batch: pa.Table, frag: str) -> None:
        """Per-host (latency_sum, n) of this batch → WaveStats, keyed by
        the deterministic fragment name (retry overwrites). Synchronous:
        the put lands before the task completes, so the wave barrier
        implies completeness."""
        import ray

        hosts = batch["host"]
        sums: dict[str, tuple[float, int]] = {}
        for rec in pa.table({"host": hosts, "lat": batch["latency_ms"]}) \
                .group_by("host").aggregate([("lat", "sum"), ("lat", "count")]) \
                .to_pylist():
            sums[rec["host"]] = (float(rec["lat_sum"]), int(rec["lat_count"]))
        ray.get(self._stats.put_latency.remote(self._wave, frag, sums))

    def _fold_penalty(self, parsed: pa.Table, frag: str) -> None:
        """Per-host max Retry-After ms of this batch (429/503 rows) →
        WaveStats. The driver raises the host's NEXT-wave politeness
        floor to it — the crawler's RFC-compliant back-off response.
        Same synchronous, fragment-keyed idempotence as _fold_latency."""
        import pyarrow.compute as pc
        import ray

        rows = parsed.filter(pc.greater_equal(
            parsed["retry_after_ms"], pa.scalar(0, type=pa.int64())))
        if not rows.num_rows:
            return
        pen = {
            rec["host"]: int(rec["retry_after_ms_max"])
            for rec in pa.table({
                "host": rows["host"],
                "retry_after_ms": rows["retry_after_ms"],
            }).group_by("host").aggregate([("retry_after_ms", "max")])
            .to_pylist()
        }
        ray.get(self._stats.put_penalty.remote(self._wave, frag, pen))

    @staticmethod
    def _frag_name(batch: pa.Table) -> str:
        import hashlib

        import numpy as np

        part = batch["part"].to_numpy(zero_copy_only=False).astype(np.int64)
        seq = batch["seq"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = ((part << 32) ^ seq).tobytes()
        return f"frag-{hashlib.blake2b(key, digest_size=10).hexdigest()}.parquet"

    def _record_validators(self, parsed: pa.Table, name: str) -> None:
        """Side-write (url_hash, etag, last_modified_us) for responses
        that carry validators: 200s define the new baseline, 304s
        re-confirm the matched one. One fragment per logical batch with
        the pages fragment's deterministic name (retry overwrites)."""
        import pyarrow.compute as pc

        st = parsed["status"]
        has_val = pc.or_(pc.is_valid(parsed["etag"]),
                         pc.greater_equal(parsed["last_modified_us"],
                                          pa.scalar(0, type=pa.int64())))
        mask = pc.and_(pc.is_in(st, value_set=pa.array([200, 304],
                                                       type=pa.int16())),
                       has_val)
        rows = parsed.filter(mask).select(
            ["url_hash", "etag", "last_modified_us"])
        if not rows.num_rows:
            return
        os.makedirs(self._validators_dir, exist_ok=True)
        frag = os.path.join(self._validators_dir, name)
        tmp = f"{frag}.tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(rows, tmp)
        os.replace(tmp, frag)

    def __call__(self, batch: pa.Table) -> pa.Table:
        parsed = self._parse(batch)
        name = self._frag_name(batch)
        frag = os.path.join(self._dir, name)
        tmp = f"{frag}.tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(parsed, tmp)
        os.replace(tmp, frag)
        if (self._validators_dir is not None
                and "etag" in parsed.column_names):
            self._record_validators(parsed, name)
        if self._stats is not None:
            if self._fold_lat:
                self._fold_latency(batch, name)
            self._fold_penalty(parsed, name)
        # discovery projection: out-links + the redirect FINAL url (null
        # for direct fetches) — the frontier build marks finals as seen
        # without admitting them (the body is already stored under them)
        proj = parsed.select(["part", "seq", "depth", "links"])
        if "redirected" in parsed.column_names:
            # build the column as a FRESH contiguous array, not a
            # pc.if_else view: Ray 2.49's optimized Arrow serializer
            # rejects the if_else output's buffer layout and falls back
            # to an IPC path that corrupts the block ("Read out of
            # bounds" on deserialize — observed, deterministic). One
            # value per PAGE row, so the python pass is trivial.
            finals = pa.array(
                [f if r else None
                 for r, f in zip(parsed["redirected"].to_pylist(),
                                 parsed["final_url"].to_pylist())],
                type=pa.string(),
            )
            proj = proj.append_column("redirect_final", finals)
        if self._retry:
            # retry half of Retry-After: 429/503 URLs become next-wave
            # candidates that BYPASS the seen check (seen_only=2 in
            # explode_links). Fresh contiguous array, not pc.if_else —
            # same Ray 2.49 serializer caveat as redirect_final above.
            retry_urls = pa.array(
                [u if st in (429, 503) else None
                 for st, u in zip(parsed["status"].to_pylist(),
                                  parsed["url_canon"].to_pylist())],
                type=pa.string(),
            )
            proj = proj.append_column("retry_url", retry_urls)
        return proj


def parse_and_sink_batch(batch: pa.Table, *, pages_dir: str,
                         extractors: dict[str, str] | None = None,
                         stats=None, wave: int = -1,
                         validators_dir: str | None = None,
                         keep_languages: tuple | None = None,
                         fold_latency: bool = True,
                         retry_rate_limited: bool = False) -> pa.Table:
    """Task-based form of the parse+sink stage (see taskstate.py for
    why). ``pages_dir`` is unique per (run, wave), so it pins the
    instance identity; the extractor registry and language gate ride in
    the key too (hashable by construction)."""
    from .taskstate import instance

    key = (pages_dir, validators_dir, wave,
           tuple(sorted((extractors or {}).items())),
           tuple(keep_languages) if keep_languages else None,
           bool(fold_latency), bool(retry_rate_limited))
    p = instance("ParseAndSink", key,
                 lambda: ParseAndSink(pages_dir, extractors=extractors,
                                      stats=stats, wave=wave,
                                      validators_dir=validators_dir,
                                      keep_languages=keep_languages,
                                      fold_latency=fold_latency,
                                      retry_rate_limited=retry_rate_limited))
    return p(batch)
