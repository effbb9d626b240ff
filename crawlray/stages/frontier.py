"""Frontier construction (SURVEY §3.2 steps J3/J2/seq): explode parsed
out-links → canonical candidate rows → packed-srckey dedup → seen-set
novelty → policy filters → per-part seq assignment.

The dedup winner key is a single packed int64 so intra-wave dedup is ONE
built-in ``groupby(url_hash).aggregate(Min(...))`` with per-block partial
aggregation (no custom aggregate, no map_groups-per-url):

    srckey64 = src_part(12b) | src_seq(30b) | link_idx(16b) | depth(6b)

Lexicographic min of the packed key == min (src_part, src_seq, link_idx)
triple — the sequential oracle's winner — and the winner's depth rides
along in the low bits (decode, don't re-join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..functions.canon import _BINARY_EXT
from ..functions.murmur3 import hash64_batch_i64
from ..pipelines.config import CrawlConfig

_HOST_RE = r"^https?://(?P<host>[^/:]+)"

SRCKEY_DEPTH_BITS = 6
SRCKEY_LINK_BITS = 16
SRCKEY_SEQ_BITS = 30


def pack_srckey(src_part, src_seq, link_idx, depth):
    """Vectorized packed dedup-winner key (see module docstring)."""
    src_part = np.asarray(src_part, dtype=np.int64)
    src_seq = np.asarray(src_seq, dtype=np.int64)
    link_idx = np.asarray(link_idx, dtype=np.int64)
    depth = np.asarray(depth, dtype=np.int64)
    return (
        (((src_part << SRCKEY_SEQ_BITS | src_seq) << SRCKEY_LINK_BITS | link_idx)
         << SRCKEY_DEPTH_BITS) | depth
    )


def unpack_depth(srckey64):
    return np.asarray(srckey64, dtype=np.int64) & ((1 << SRCKEY_DEPTH_BITS) - 1)


def _candidate_table(flat, src_part, src_seq, link_idx, depth, n_parts,
                     seen_only) -> pa.Table:
    """Canonical candidate rows from parallel url/src arrays (shared by
    the link explode and the redirect-final mark rows)."""
    srckey = pack_srckey(src_part, src_seq, link_idx, depth)
    host = pc.struct_field(pc.extract_regex(flat, _HOST_RE), "host")
    url_hash = hash64_batch_i64(flat)
    host_hash = hash64_batch_i64(host.fill_null(""))
    part = (host_hash.view(np.uint64) % np.uint64(n_parts)).astype(np.int64)
    return pa.table(
        {
            "url_canon": flat,
            "url_hash": pa.array(url_hash),
            "host": host,
            "host_hash": pa.array(host_hash),
            "part": pa.array(part),
            "srckey64": pa.array(srckey),
            "seen_only": pa.array(
                np.full(len(flat), seen_only, dtype=np.int64)),
            # link/mark discoveries carry no publish stamp — only feed
            # candidates (feeds.feed_candidates) can trigger a refresh
            "lastmod_us": pa.array(np.full(len(flat), -1, dtype=np.int64)),
        }
    )


_EMPTY_CANDIDATES = pa.table(
    {
        "url_canon": pa.array([], type=pa.string()),
        "url_hash": pa.array([], type=pa.int64()),
        "host": pa.array([], type=pa.string()),
        "host_hash": pa.array([], type=pa.int64()),
        "part": pa.array([], type=pa.int64()),
        "srckey64": pa.array([], type=pa.int64()),
        "seen_only": pa.array([], type=pa.int64()),
        "lastmod_us": pa.array([], type=pa.int64()),
    }
)


def explode_links(batch: pa.Table, n_parts: int) -> pa.Table:
    """Parsed pages (part, seq, depth, links[, redirect_final]) → one
    candidate row per out-link with canonical fields + packed srckey,
    plus one ``seen_only=1`` mark row per redirect final url (the page's
    body is already stored under that url; the frontier build inserts it
    into the seen set WITHOUT admitting it, so no alias or later link
    ever re-fetches it). Fully vectorized: Arrow list kernels for the
    explode, regex kernel for host extraction, numpy for
    hashing/packing."""
    links = batch["links"].combine_chunks()
    flat = pc.list_flatten(links)
    pieces = []
    n = len(flat)
    if n:
        parent = pc.list_parent_indices(links).to_numpy(zero_copy_only=False)
        offsets = links.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        link_idx = np.arange(n, dtype=np.int64) - offsets[parent]
        src_part = batch["part"].to_numpy(zero_copy_only=False).astype(np.int64)[parent]
        src_seq = batch["seq"].to_numpy(zero_copy_only=False).astype(np.int64)[parent]
        depth = batch["depth"].to_numpy(zero_copy_only=False).astype(np.int64)[parent] + 1
        pieces.append(_candidate_table(flat, src_part, src_seq, link_idx,
                                       depth, n_parts, 0))
    if "redirect_final" in batch.column_names:
        rf = batch["redirect_final"].combine_chunks()
        mask = pc.is_valid(rf).to_numpy(zero_copy_only=False)
        if mask.any():
            finals = rf.filter(pa.array(mask))
            src_part = batch["part"].to_numpy(
                zero_copy_only=False).astype(np.int64)[mask]
            src_seq = batch["seq"].to_numpy(
                zero_copy_only=False).astype(np.int64)[mask]
            depth = batch["depth"].to_numpy(
                zero_copy_only=False).astype(np.int64)[mask] + 1
            zeros = np.zeros(mask.sum(), dtype=np.int64)
            pieces.append(_candidate_table(finals, src_part, src_seq,
                                           zeros, depth, n_parts, 1))
    if "retry_url" in batch.column_names:
        # Retry-After retry rows (seen_only=2): re-admit the 429/503 URL
        # at its OWN depth (same URL, not a new hop) — the builders'
        # force channel bypasses the seen check for these
        ru = batch["retry_url"].combine_chunks()
        mask = pc.is_valid(ru).to_numpy(zero_copy_only=False)
        if mask.any():
            urls = ru.filter(pa.array(mask))
            src_part = batch["part"].to_numpy(
                zero_copy_only=False).astype(np.int64)[mask]
            src_seq = batch["seq"].to_numpy(
                zero_copy_only=False).astype(np.int64)[mask]
            depth = batch["depth"].to_numpy(
                zero_copy_only=False).astype(np.int64)[mask]
            zeros = np.zeros(int(mask.sum()), dtype=np.int64)
            pieces.append(_candidate_table(urls, src_part, src_seq,
                                           zeros, depth, n_parts, 2))
    if not pieces:
        return _EMPTY_CANDIDATES
    return pa.concat_tables(pieces) if len(pieces) > 1 else pieces[0]


def policy_filter(batch: pa.Table, robots, max_depth: int,
                  allowed_hosts=None) -> pa.Table:
    """Drop candidates that are uncrawlable / robots-denied / too deep /
    off the host allowlist. Runs AFTER seen-marking (parity: discovery
    admits to the seen set, filters only gate the frontier).
    Binary-extension check is an Arrow regex kernel; robots prefix match
    is per-row over a per-host memo."""
    urls = batch["url_canon"]
    depth_ok = pa.array(unpack_depth(batch["srckey64"].to_numpy(zero_copy_only=False)) <= max_depth)
    not_binary = pc.invert(
        pc.match_substring_regex(urls, _BINARY_EXT.pattern, ignore_case=True)
    )
    len_ok = pc.less_equal(pc.utf8_length(urls), 2048)
    allowed = pa.array(robots.allowed_many(urls.to_pylist()))
    mask = pc.and_(pc.and_(depth_ok, not_binary), pc.and_(len_ok, allowed))
    if allowed_hosts is not None:
        mask = pc.and_(mask, pc.is_in(
            batch["host"],
            value_set=pa.array(sorted(allowed_hosts), type=pa.string())))
    return batch.filter(mask)


def policy_mask(df: pd.DataFrame, robots, max_depth: int,
                allowed_hosts) -> np.ndarray:
    """The engine's M2 policy gate over a candidate frame (pandas form,
    shared by the fused and salted frontier builders): within depth, not
    a binary asset, sane length, not a crawler-trap path (repeated /
    unboundedly deep segments — canon.is_trap_path), robots-allowed,
    and — when the crawl is
    scoped to a closed host set (the reference's news-domain allowlist) —
    on the list. Candidates failing it were ALREADY seen-marked: the gate
    decides fetching, not dedup identity."""
    depth = unpack_depth(df["srckey64"].to_numpy())
    ok = depth <= max_depth
    ok &= ~df["url_canon"].str.contains(
        _BINARY_EXT.pattern, case=False, regex=True
    ).to_numpy(dtype=bool, na_value=False)
    ok &= (df["url_canon"].str.len() <= 2048).to_numpy(dtype=bool, na_value=False)
    from ..functions.canon import is_trap_path
    ok &= np.fromiter((not is_trap_path(u) for u in df["url_canon"]),
                      dtype=bool, count=len(df))
    ok &= np.asarray(robots.allowed_many(df["url_canon"].tolist()), dtype=bool)
    if allowed_hosts is not None:
        ok &= df["host"].isin(allowed_hosts).to_numpy(dtype=bool)
    return ok


def send_part_stats(stats, wave: int, df: pd.DataFrame) -> None:
    """Push this part group's per-host admitted counts to the WaveStats
    actor (A6 fold — see state/wavestats.py). Synchronous on purpose:
    the ``ray.get`` makes the put land before the group task completes,
    so the wave's write barrier implies every slot is present."""
    if stats is None or not len(df):
        return
    counts = {k: int(v) for k, v in df["host"].value_counts().items()}
    ray.get(stats.put.remote(wave, int(df["part"].iat[0]), counts))


class SeqAssigner:
    """Per-part actor-pool stage (groupby("part").map_groups): applies the
    per-host page-cap budget in srckey order, assigns the deterministic
    ``seq`` rank — the parity-critical ordering key — and stamps the
    politeness virtual clock (``scheduled_ms``): a host's j-th fetch of
    the wave is scheduled at j × crawl_delay(host).

    Scheduling at frontier-WRITE time (here) instead of wave start means
    the next wave needs no extra groupby("part") sort before fetching —
    one all-to-all saved per wave. Output rows are emitted in the
    partition's fetch order (scheduled_ms, host, seq).

    In the hot-host salted path this is STAGE 2: DedupNoveltyPolicy
    groups (salted by url_hash) have already deduped/marked/filtered, so
    this stage sees only admitted survivors — the per-part sequencing
    still covers the host's FULL admitted set in one group, which is what
    keeps seq ranks and the politeness clock identical to the unsalted
    path (the shared-delay-budget property: one clock per host, stamped
    in one place)."""

    def __init__(self, budget_ref, cap: int, wave: int, robots_ref=None,
                 stats=None):
        self._prior: dict[str, int] = ray.get(budget_ref) if budget_ref is not None else {}
        self._cap = cap
        self._wave = wave
        self._robots = ray.get(robots_ref) if robots_ref is not None else None
        self._stats = stats
        self._delay_cache: dict[str, int] = {}

    def _delay(self, host: str) -> int:
        d = self._delay_cache.get(host)
        if d is None:
            d = self._robots.crawl_delay_ms(host)
            self._delay_cache[host] = d
        return d

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("srckey64", kind="mergesort", ignore_index=True)
        within = df.groupby("host", sort=False).cumcount()
        prior = df["host"].map(self._prior).fillna(0).astype(np.int64)
        df = df[(within + prior) < self._cap].reset_index(drop=True)
        df["depth"] = unpack_depth(df["srckey64"].to_numpy()).astype(np.int64)
        df["seq"] = np.arange(len(df), dtype=np.int64)
        df["wave"] = np.int64(self._wave)
        if self._robots is not None:
            j = df.groupby("host", sort=False).cumcount()
            delays = df["host"].map(self._delay)
            df["scheduled_ms"] = (j * delays).astype(np.float64)
            df = df.sort_values(
                ["scheduled_ms", "host", "seq"], kind="mergesort", ignore_index=True
            )
        send_part_stats(self._stats, self._wave, df)
        return df


_NO_VERSION = np.int64(1 << 62)  # absent version: never "older than" a stamp


def fold_versions(df: pd.DataFrame, versions_dir, group_id: int) -> None:
    """Refresh-crawl version fold: persist this group's observed feed
    stamps — max ``lastmod_us`` per url_hash over ALL candidate rows
    (pre-dedup, pre-novelty: observing an entry defines the known
    version whether or not the URL is admitted). One fragment per group
    with a DETERMINISTIC name (+ atomic rename), so a retried group task
    overwrites rather than duplicates — the same idempotence contract as
    the pages sink. The driver max-merges the wave's fragments after the
    wave barrier; a LATER refresh run loads them as its baseline."""
    if versions_dir is None:
        return
    obs = df[df["lastmod_us"] >= 0]
    if not len(obs):
        return
    import os
    import uuid

    g = obs.groupby("url_hash", sort=True)["lastmod_us"].max()
    t = pa.table({
        "url_hash": pa.array(g.index.to_numpy().astype(np.int64)),
        "lastmod_us": pa.array(g.to_numpy().astype(np.int64)),
    })
    os.makedirs(versions_dir, exist_ok=True)
    frag = os.path.join(versions_dir, f"group-{int(group_id)}.parquet")
    tmp = f"{frag}.tmp-{uuid.uuid4().hex[:8]}"
    import pyarrow.parquet as pq

    pq.write_table(t, tmp)
    os.replace(tmp, frag)


_NEVER_DUE = 1 << 62


def refetch_overrides(df: pd.DataFrame, novel: np.ndarray,
                      versions: dict | None,
                      revisit_due: dict | None = None,
                      run_idx: int = 0) -> np.ndarray:
    """Refresh admission (config.refetch_if_newer): a non-novel URL whose
    wave-max feed stamp is STRICTLY newer than its recorded version is
    re-admitted. URLs with no recorded baseline never refetch (their
    "last fetch" stamp is unknowable); the observation itself becomes the
    baseline for the next run (fold_versions).

    Adaptive-revisit admission (config.adaptive_revisit): independently,
    a non-novel URL whose revisit clock is DUE (url_hash -> due_run,
    due_run <= run_idx) re-admits — the stampless-page refresh channel.
    The driver removes a hash from the broadcast store once it reaches a
    frontier, so a URL revisits at most once per run."""
    if versions is None and revisit_due is None:
        return novel
    out = novel
    if versions is not None:
        lm = df["lastmod_us"].to_numpy()
        uh = df["url_hash"].to_numpy()
        # dict lookup row-wise (NOT Series.map + fillna: missing keys
        # would round the int64 hashes through float64). Rows with no
        # stamp skip the lookup entirely — the common case costs nothing.
        recorded = np.full(len(uh), _NO_VERSION, dtype=np.int64)
        for i in np.flatnonzero(lm >= 0):
            recorded[i] = versions.get(int(uh[i]), _NO_VERSION)
        out = out | ((~novel) & (lm > recorded))
    if revisit_due is not None:
        uh = df["url_hash"].to_numpy()
        due = np.zeros(len(uh), dtype=bool)
        # only seen rows can be due; the store is bounded by urls ever
        # fetched on this chain (same scaling class as the version dict)
        for i in np.flatnonzero(~novel):
            if revisit_due.get(int(uh[i]), _NEVER_DUE) <= run_idx:
                due[i] = True
        out = out | due
    return out


def apply_force(df: pd.DataFrame, mask: np.ndarray) -> np.ndarray:
    """Retry-After force channel (seen_only=2 → mark_redirect_finals'
    ``force`` column): a retried URL bypasses the seen check — it is in
    the seen set by definition (it was fetched and 429'd)."""
    if "force" in df.columns:
        mask = mask | df["force"].to_numpy(dtype=bool)
    return mask


def fold_force(df: pd.DataFrame) -> pd.DataFrame:
    """Before the min-srckey dedup: OR the force flag across each
    url_hash's rows, so a retry row losing the dedup to a plain link row
    cannot silently drop the retry."""
    if "force" in df.columns and df["force"].any():
        df = df.assign(force=df.groupby("url_hash")["force"]
                       .transform("max").astype(bool))
    return df


def mark_redirect_finals(df: pd.DataFrame, novelty, shards) -> pd.DataFrame:
    """Split off ``seen_only=1`` rows (redirect final urls), insert their
    hashes into the cuckoo shards (idempotent), and return the normal
    candidate rows with the flag column dropped. Insertion happens
    BEFORE the group's novelty pass, so same-wave candidates for an
    already-stored final url are non-novel — fetched exactly once."""
    if "seen_only" not in df.columns:
        return df
    flags = df["seen_only"].to_numpy()
    if (flags == 1).any():
        marks = df[flags == 1]
        novelty(shards,
                np.unique(marks["url_hash"].to_numpy().astype(np.int64)))
        df = df[flags != 1]
        flags = flags[flags != 1]
    df = df.drop(columns=["seen_only"]).reset_index(drop=True)
    if (flags == 2).any():
        # Retry-After retry rows: carry the force flag through dedup so
        # the builders can bypass the seen check for these url_hashes
        df = df.assign(force=(flags == 2))
    return df


class PartFrontierBuilder:
    """The whole frontier build for one part group, in the engine's ONE
    per-wave shuffle (``groupby("part").map_groups`` — the mandated
    host-hash exchange): min-srckey intra-wave dedup → cuckoo-shard
    novelty → policy gate → per-host page-cap budget → deterministic
    ``seq`` rank → politeness virtual clock.

    Fusing all six steps into the part group is correct because
    ``part = host_hash % P`` and a URL's host is a pure function of the
    URL: every candidate row for a given url_hash lands in the same part
    group, so the group sees the full dedup/novelty picture for its URLs.
    (The naive design pays a second groupby(url_hash) all-to-all for the
    dedup — redundant given the key dependency.) Novelty stays
    deterministic: each url_hash is offered to its seen shard exactly
    once per wave, from exactly one group."""

    def __init__(self, shards, robots_ref, budget_ref, cap: int, wave: int,
                 max_depth: int, stats=None, allowed_hosts=None,
                 versions_dir=None, versions_ref=None,
                 revisit_ref=None, run_idx: int = 0):
        from ..state.seen import novelty_mask

        self._novelty = novelty_mask
        self._shards = shards
        self._robots = ray.get(robots_ref)
        self._prior: dict[str, int] = ray.get(budget_ref) if budget_ref is not None else {}
        self._cap = cap
        self._wave = wave
        self._max_depth = max_depth
        self._allowed = frozenset(allowed_hosts) if allowed_hosts else None
        self._versions_dir = versions_dir
        # recorded feed-stamp baseline (url_hash → lastmod_us) through the
        # PREVIOUS wave — None unless refetch_if_newer is on
        self._versions = (ray.get(versions_ref)
                          if versions_ref is not None else None)
        # adaptive-revisit due map (url_hash -> due_run) through the
        # PREVIOUS wave — None unless adaptive_revisit is on
        self._revisit = (ray.get(revisit_ref)
                         if revisit_ref is not None else None)
        self._run_idx = run_idx
        self._stats = stats
        self._delay_cache: dict[str, int] = {}

    def _delay(self, host: str) -> int:
        d = self._delay_cache.get(host)
        if d is None:
            d = self._robots.crawl_delay_ms(host)
            self._delay_cache[host] = d
        return d

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        # 0. redirect-final mark rows: insert into the seen set FIRST and
        #    exclude from admission — their bodies are already stored, so
        #    a same-wave (or any later) link to the final url must dedup
        #    against them. part = host_hash % P, so a url's marks and its
        #    normal candidates always meet in this one group.
        df = mark_redirect_finals(df, self._novelty, self._shards)
        # 0b. refresh-crawl version fold: record observed feed stamps
        #     (pre-dedup — observation defines the version) and merge
        #     each url's wave-max stamp onto its rows so the min-srckey
        #     dedup winner carries it into the refetch decision
        if self._versions_dir is not None and len(df):
            fold_versions(df, self._versions_dir, int(df["part"].iat[0]))
        if self._versions is not None and len(df):
            df = df.assign(lastmod_us=df.groupby("url_hash")["lastmod_us"]
                           .transform("max"))
        # 1. intra-wave dedup: min srckey64 wins (sorted → keep first);
        #    retry flags OR across a url's rows first
        df = fold_force(df)
        df = df.sort_values("srckey64", kind="mergesort", ignore_index=True)
        df = df.drop_duplicates("url_hash", keep="first", ignore_index=True)
        # 2. cross-wave novelty: offer the wave-unique hashes to the
        #    cuckoo shards (admission-time seen semantics, oracle parity)
        #    — plus refresh re-admission for strictly-newer feed stamps
        #    and the Retry-After force channel
        mask = self._novelty(self._shards, df["url_hash"].to_numpy().astype(np.int64))
        mask = refetch_overrides(df, mask, self._versions,
                                 self._revisit, self._run_idx)
        mask = apply_force(df, mask)
        df = df[mask].reset_index(drop=True)
        # 3. policy gate (shared predicates: depth/binary/len/robots/
        #    host allowlist)
        ok = policy_mask(df, self._robots, self._max_depth, self._allowed)
        df = df[ok].reset_index(drop=True)
        # the stamp's job (version fold + refetch) is done — keep the
        # frontier parquet lean
        drop = [c for c in ("lastmod_us", "force") if c in df.columns]
        if drop:
            df = df.drop(columns=drop)
        # 4. per-host page-cap budget, consumed in srckey order
        within = df.groupby("host", sort=False).cumcount()
        prior = df["host"].map(self._prior).fillna(0).astype(np.int64)
        df = df[(within + prior) < self._cap].reset_index(drop=True)
        # 5. deterministic seq rank + wave stamp
        df = df.assign(
            depth=unpack_depth(df["srckey64"].to_numpy()).astype(np.int64),
            seq=np.arange(len(df), dtype=np.int64),
            wave=np.full(len(df), self._wave, dtype=np.int64),
        )
        # 6. politeness virtual clock; emit in the part's fetch order
        j = df.groupby("host", sort=False).cumcount()
        delays = df["host"].map(self._delay)
        df["scheduled_ms"] = (j * delays).astype(np.float64)
        df = df.sort_values(
            ["scheduled_ms", "host", "seq"], kind="mergesort", ignore_index=True
        )
        # 7. A6 fold: admitted-host counts to the WaveStats actor — the
        #    driver never re-reads the frontier to learn them
        send_part_stats(self._stats, self._wave, df)
        return df


def salt_gparts(batch: pa.Table, hot_hosts: set[str], n_parts: int,
                m: int) -> pa.Table:
    """A6 salted-part assignment (SURVEY §4.2) for the candidate stream:
    ``gpart = part·m + salt`` where salt = url_hash % m for hot hosts and
    0 otherwise. The salt is a function of the URL — every copy of a
    url_hash still meets in exactly ONE group, so the dedup/novelty
    semantics of the salted groupby are identical to the unsalted one;
    only a hot host's candidate volume is spread over m groups."""
    part = batch["part"].to_numpy(zero_copy_only=False).astype(np.int64)
    salt = np.zeros(len(batch), dtype=np.int64)
    if hot_hosts:
        is_hot = pc.is_in(
            batch["host"], value_set=pa.array(sorted(hot_hosts), type=pa.string())
        ).to_numpy(zero_copy_only=False)
        uh = batch["url_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        salt = np.where(is_hot, (uh % np.uint64(m)).astype(np.int64), 0)
    return batch.append_column("gpart", pa.array(part * m + salt))


class DedupNoveltyPolicy:
    """STAGE 1 of the hot-host salted frontier build
    (``groupby("gpart").map_groups``): intra-wave min-srckey dedup →
    cuckoo-shard novelty → policy gate — the heavy, per-candidate work,
    spread over ``hot_salt_parts`` groups per part for hot hosts. The
    light per-part sequencing (page-cap budget, seq rank, politeness
    clock) runs afterwards in SeqAssigner over the admitted survivors
    only, so a hot host's cap/clock still come from ONE group — the
    shared-budget property that keeps salted output byte-identical to
    the fused single-shuffle path (asserted in tests)."""

    def __init__(self, shards, robots_ref, max_depth: int,
                 allowed_hosts=None, versions_dir=None, versions_ref=None,
                 revisit_ref=None, run_idx: int = 0):
        from ..state.seen import novelty_mask

        self._novelty = novelty_mask
        self._shards = shards
        self._robots = ray.get(robots_ref)
        self._max_depth = max_depth
        self._allowed = frozenset(allowed_hosts) if allowed_hosts else None
        self._versions_dir = versions_dir
        self._versions = (ray.get(versions_ref)
                          if versions_ref is not None else None)
        self._revisit = (ray.get(revisit_ref)
                         if revisit_ref is not None else None)
        self._run_idx = run_idx

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        # redirect-final marks first (salt = url_hash % m keeps a url's
        # marks and candidates in this one group — same guarantee as the
        # unsalted path; ditto the version fold / refetch below)
        df = mark_redirect_finals(df, self._novelty, self._shards)
        if self._versions_dir is not None and len(df):
            fold_versions(df, self._versions_dir, int(df["gpart"].iat[0]))
        if self._versions is not None and len(df):
            df = df.assign(lastmod_us=df.groupby("url_hash")["lastmod_us"]
                           .transform("max"))
        df = fold_force(df)
        df = df.sort_values("srckey64", kind="mergesort", ignore_index=True)
        df = df.drop_duplicates("url_hash", keep="first", ignore_index=True)
        mask = self._novelty(self._shards, df["url_hash"].to_numpy().astype(np.int64))
        mask = refetch_overrides(df, mask, self._versions,
                                 self._revisit, self._run_idx)
        mask = apply_force(df, mask)
        df = df[mask].reset_index(drop=True)
        ok = policy_mask(df, self._robots, self._max_depth, self._allowed)
        df = df[ok].reset_index(drop=True)
        drop = [c for c in ("gpart", "lastmod_us", "force")
                if c in df.columns]
        return df.drop(columns=drop).reset_index(drop=True)


def admit_seeds(seed_urls: list[str], robots, shards, cfg: CrawlConfig,
                revisit_due: dict | None = None,
                run_idx: int = 0) -> pa.Table:
    """Wave-0 admission on the driver (seeds are tiny): canonicalize,
    first-occurrence dedup, seen-mark, policy filter, per-part seq —
    byte-identical semantics to the oracle's wave 0. ``revisit_due``:
    adaptive-revisit admission for seen seeds whose clock is due (same
    rule as refetch_overrides)."""
    from ..functions.canon import canonicalize, host_of, is_crawlable
    from ..functions.murmur3 import hash64s
    from ..pipelines.config import part_of
    from ..state.seen import novelty_mask

    best: dict[str, int] = {}
    for i, u in enumerate(seed_urls):
        cu = canonicalize(u)
        if cu and cu not in best:
            best[cu] = i
    urls = sorted(best, key=best.get)
    hashes = np.array([hash64s(u) for u in urls], dtype=np.int64)
    new = novelty_mask(shards, hashes)
    rows = []
    allowed = set(cfg.allowed_hosts) if cfg.allowed_hosts else None
    for u, h, isnew in zip(urls, hashes, new):
        due = (revisit_due is not None
               and revisit_due.get(int(h), _NEVER_DUE) <= run_idx)
        if (not (isnew or due) or not is_crawlable(u, allowed_hosts=allowed)
                or not robots.allowed(u)):
            continue
        host = host_of(u)
        rows.append(
            {
                "url_canon": u,
                "url_hash": int(h),
                "host": host,
                "host_hash": hash64s(host),
                "part": part_of(hash64s(host), cfg.n_parts),
                "srckey64": int(pack_srckey(0, 0, best[u], 0)),
            }
        )
    rows.sort(key=lambda r: (r["part"], r["srckey64"]))
    seq_in_part: dict[int, int] = {}
    cap_in_host: dict[str, int] = {}
    out = []
    for r in rows:
        if cap_in_host.get(r["host"], 0) >= cfg.max_pages_per_host:
            continue
        j = cap_in_host.get(r["host"], 0)
        cap_in_host[r["host"]] = j + 1
        r["seq"] = seq_in_part.get(r["part"], 0)
        seq_in_part[r["part"]] = r["seq"] + 1
        r["depth"] = 0
        r["wave"] = 0
        r["scheduled_ms"] = float(j * robots.crawl_delay_ms(r["host"]))
        out.append(r)
    if not out:
        return None
    out.sort(key=lambda r: (r["part"], r["scheduled_ms"], r["host"], r["seq"]))
    df = pd.DataFrame(out)
    return pa.Table.from_pandas(df, preserve_index=False)


def build_part_frontier(df: pd.DataFrame, *, shards, robots_ref, budget_ref,
                        cap: int, wave: int, max_depth: int, stats=None,
                        allowed_hosts=None, versions_dir=None,
                        versions_ref=None, revisit_ref=None,
                        run_idx: int = 0) -> pd.DataFrame:
    """Task-based form of PartFrontierBuilder (see taskstate.py).
    ``budget_ref`` is a fresh per-wave ray.put and ``robots_ref`` a
    fresh per-run one, so the key scopes the memoized instance exactly;
    the shard/stats actor handles are run-constant under that key."""
    from .taskstate import instance

    key = (robots_ref, budget_ref, wave, cap, max_depth,
           versions_dir, versions_ref, revisit_ref, run_idx,
           tuple(sorted(allowed_hosts)) if allowed_hosts else None)
    b = instance("PartFrontierBuilder", key,
                 lambda: PartFrontierBuilder(
                     shards, robots_ref, budget_ref, cap, wave, max_depth,
                     stats=stats, allowed_hosts=allowed_hosts,
                     versions_dir=versions_dir, versions_ref=versions_ref,
                     revisit_ref=revisit_ref, run_idx=run_idx))
    return b(df)


def dedup_novelty_policy(df: pd.DataFrame, *, shards, robots_ref,
                         max_depth: int, allowed_hosts=None,
                         versions_dir=None, versions_ref=None,
                         revisit_ref=None, run_idx: int = 0
                         ) -> pd.DataFrame:
    """Task-based form of DedupNoveltyPolicy (salted stage 1)."""
    from .taskstate import instance

    key = (robots_ref, max_depth, versions_dir, versions_ref,
           revisit_ref, run_idx,
           tuple(sorted(allowed_hosts)) if allowed_hosts else None)
    d = instance("DedupNoveltyPolicy", key,
                 lambda: DedupNoveltyPolicy(
                     shards, robots_ref, max_depth,
                     allowed_hosts=allowed_hosts,
                     versions_dir=versions_dir,
                     versions_ref=versions_ref,
                     revisit_ref=revisit_ref, run_idx=run_idx))
    return d(df)


def assign_seq(df: pd.DataFrame, *, budget_ref, cap: int, wave: int,
               robots_ref=None, stats=None) -> pd.DataFrame:
    """Task-based form of SeqAssigner (salted stage 2)."""
    from .taskstate import instance

    key = (budget_ref, cap, wave, robots_ref)
    s = instance("SeqAssigner", key,
                 lambda: SeqAssigner(budget_ref, cap, wave,
                                     robots_ref=robots_ref, stats=stats))
    return s(df)
