"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported — nothing
here (or in crawlray) calls ray.init()/ray.shutdown().

- ``entry()``: flagship smoke — sf0.001 documents → interleaved-docs
  (DOCS schema: doc_id + spans list<struct<kind,text,media_ref,offset>>).
- ``queries()``: every implemented operator family from SURVEY.md §2 —
  relational core incl. CSV/SQL sink round-trips
  (pipelines/relational.py), crawl kernels + the full dedup family
  (exact / MinHash+LSH / SimHash-banded / n-gram Jaccard /
  embedding-cosine) / similarity search / text-analysis / multimodal
  ops / integrated feed-discovery crawls (pipelines/dataops.py).
- ``oracle_sql()``: DuckDB equivalents where SQL can express the
  semantics; rows-only entries (murmur3, minhash/simhash near-dup, HLL,
  ANN-LSH, lang-id, fingerprints, media decode, qa sampling, the crawl
  demos) are omitted by design — each is pinned by a pytest assertion
  instead (tests/test_driver_contract.py, tests/test_scale_shapes.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry() -> Any:
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from crawlray.functions.spans import text_rows_to_docs

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])

    def build(b: pa.Table) -> pa.Table:
        ids = pc.binary_join_element_wise(
            pa.array(["doc"] * b.num_rows), pc.cast(b["doc_id"], pa.string()), "-"
        )
        return text_rows_to_docs(ids.combine_chunks(), b["text"].combine_chunks())

    return ds.map_batches(build, batch_format="pyarrow", zero_copy_batch=True)


def _registry():
    from crawlray.pipelines.analytics import ANALYTICS_QUERIES
    from crawlray.pipelines.dataops import DATAOPS_QUERIES
    from crawlray.pipelines.relational import RELATIONAL_QUERIES
    from crawlray.pipelines.roundfive import ROUNDFIVE_QUERIES
    from crawlray.pipelines.tpch import TPCH_QUERIES

    merged: dict[str, tuple] = {}
    merged.update(RELATIONAL_QUERIES)
    merged.update(ANALYTICS_QUERIES)
    merged.update(DATAOPS_QUERIES)
    merged.update(TPCH_QUERIES)
    merged.update(ROUNDFIVE_QUERIES)
    return merged


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _registry().items() if sql}
