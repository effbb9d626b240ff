"""Declared Arrow schemas for every logical table (SURVEY.md §1.2).

Schemas are fixed constants — never inferred. The ``DOCS`` shape is the
authoritative input/output contract from BASELINE.json L15 (input_hint):
one row per document, ``spans`` interleaving text and media in original
document order; per-row parity invariant is span-sequence equality on
``(kind, text, media_ref, order)``.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- T1: docs
SPAN = pa.struct(
    [
        ("kind", pa.string()),       # "text" | "image" | "video" | "audio" | "link"
        ("text", pa.string()),       # null for pure-media spans
        ("media_ref", pa.string()),  # null for text spans
        ("offset", pa.int32()),      # 0-based span position == list index
    ]
)
DOCS = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN))])

# ------------------------------------------------------------ T2: frontier
FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("url_canon", pa.string()),
        ("url_hash", pa.int64()),    # murmur3 low 64 bits, int64-reinterpreted (see murmur3.to_i64)
        ("host", pa.string()),
        ("host_hash", pa.int64()),
        ("part", pa.int64()),        # host_hash % P (+ hot-host salt)
        ("depth", pa.int64()),
        ("wave", pa.int64()),
        ("seq", pa.int64()),         # deterministic discovery sequence (SURVEY §3.2)
        ("priority", pa.int32()),
        ("src_doc", pa.string()),
    ]
)

# ------------------------------------------------------------- T3: fetches
FETCHES = pa.schema(
    [
        ("url_hash", pa.int64()),
        ("url_canon", pa.string()),
        ("host", pa.string()),
        ("part", pa.int64()),
        ("wave", pa.int64()),
        ("seq", pa.int64()),
        ("depth", pa.int64()),
        ("status", pa.int16()),
        ("content_type", pa.string()),
        ("body", pa.large_binary()),
        ("latency_ms", pa.float32()),
        ("scheduled_ms", pa.float64()),  # virtual-clock politeness schedule time
    ]
)

# -------------------------------------------------------------- T4: robots
ROBOTS = pa.schema(
    [
        ("host", pa.string()),
        ("allow", pa.list_(pa.string())),   # path prefixes
        ("deny", pa.list_(pa.string())),    # path prefixes
        ("crawl_delay_ms", pa.int32()),
        ("fetched_ok", pa.bool_()),
    ]
)

# --------------------------------------------------------- T5: seen shards
SEEN_SHARDS = pa.schema(
    [
        ("shard", pa.int32()),
        ("buckets", pa.large_binary()),  # numpy uint16 bucket-array dump
        ("exact", pa.large_binary()),    # numpy uint64 dump of exact hashes
        ("n_items", pa.int64()),
        ("wave", pa.int32()),
    ]
)

# ------------------------------------------------------ T6: metrics/lineage
METRICS = pa.schema(
    [
        ("wave", pa.int32()),
        ("part", pa.int32()),
        ("stage", pa.string()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("bytes", pa.int64()),
        ("wall_ms", pa.float64()),
        ("input_refs", pa.string()),  # JSON list of upstream checkpoint paths
    ]
)

# ------------------------------------------------- mini-web fixture tables
SEEDS = pa.schema([("url", pa.string()), ("priority", pa.int32())])

PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("status", pa.int16()),
        ("content_type", pa.string()),
        ("html", pa.large_binary()),
        ("latency_ms", pa.float32()),
    ]
)
