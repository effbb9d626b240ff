"""M8: span assembly — build the Arrow ``list<struct>`` spans column.

The DOCS payload (schemas.DOCS) is assembled zero-copy-ish with
``pa.ListArray.from_arrays`` over flat child arrays, never via Python
row dicts. ``offset`` mirrors the list index (BASELINE.json input_hint:
order is the invariant; offset makes it explicit and survives explode/
regroup round-trips).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..schemas import DOCS, SPAN


def spans_to_arrow(per_doc_spans: list[list[tuple[str, str | None, str | None]]]) -> pa.ListArray:
    """[[(kind, text, media_ref), ...] per doc] → ListArray<SPAN>."""
    lengths = np.fromiter((len(s) for s in per_doc_spans), dtype=np.int64,
                          count=len(per_doc_spans))
    offsets = np.zeros(len(per_doc_spans) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    kinds: list[str] = []
    texts: list[str | None] = []
    refs: list[str | None] = []
    offs: list[int] = []
    for spans in per_doc_spans:
        for i, (kind, text, ref) in enumerate(spans):
            kinds.append(kind)
            texts.append(text)
            refs.append(ref)
            offs.append(i)
    struct = pa.StructArray.from_arrays(
        [
            pa.array(kinds, type=pa.string()),
            pa.array(texts, type=pa.string()),
            pa.array(refs, type=pa.string()),
            pa.array(offs, type=pa.int32()),
        ],
        fields=list(SPAN),
    )
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), struct)


def docs_table(doc_ids: list[str], per_doc_spans) -> pa.Table:
    """Assemble a DOCS-schema table."""
    return pa.Table.from_arrays(
        [pa.array(doc_ids, type=pa.string()), spans_to_arrow(per_doc_spans)],
        schema=DOCS,
    )


def spans_from_arrow(spans_col: pa.Array) -> list[list[tuple[str, str | None, str | None, int]]]:
    """Inverse (for parity tests): ListArray → python tuples incl. offset."""
    out = []
    for row in spans_col.to_pylist():
        out.append([(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in (row or [])])
    return out


def text_rows_to_docs(doc_ids, texts) -> pa.Table:
    """Flagship smoke path (FIXTURES.md §3): one text column → single-span
    docs, vectorized — each row becomes ``[{kind:'text', text, None, 0}]``."""
    n = len(doc_ids)
    offsets = pa.array(np.arange(n + 1, dtype=np.int32))
    texts_arr = texts if isinstance(texts, pa.Array) else pa.array(texts, type=pa.string())
    struct = pa.StructArray.from_arrays(
        [
            pa.array(["text"] * n, type=pa.string()),
            texts_arr.cast(pa.string()),
            pa.nulls(n, type=pa.string()),
            pa.array(np.zeros(n, dtype=np.int32)),
        ],
        fields=list(SPAN),
    )
    ids = doc_ids if isinstance(doc_ids, pa.Array) else pa.array(doc_ids, type=pa.string())
    return pa.Table.from_arrays(
        [ids.cast(pa.string()), pa.ListArray.from_arrays(offsets, struct)], schema=DOCS
    )
