"""S6: Lance-shaped docs sink (+ generic table sink) with parquet fallback.

The north rule mandates Lance output; ``pylance`` is absent in this
sandbox (SURVEY §0.4), and Ray's ``write_lance`` raises ImportError
without it. So: when the lance wheel is importable we use
``Dataset.write_lance``; otherwise we write parquet fragments plus an
atomic ``_manifest.json`` carrying the logical schema, fragment list and
row counts — the same contract (append-able fragments + manifest)
consumers would get from Lance, checked by tests. Layout is one
directory per (wave) partition so a resumed run skips finished waves.
"""

from __future__ import annotations

import importlib.util
import json
import os
import tempfile

import pyarrow.parquet as pq

HAVE_LANCE = importlib.util.find_spec("lance") is not None


def _atomic_write_json(path: str, obj) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(obj, f, indent=1, default=str)
    os.replace(tmp, path)  # atomic on POSIX


def write_table(ds, uri: str, *, logical_schema=None) -> dict:
    """Write a Ray Dataset as a lance(-compat) table; returns the manifest.
    Executes the dataset (this is the consuming sink)."""
    if HAVE_LANCE:
        ds.write_lance(uri)
        return {"format": "lance", "uri": uri}
    ds.write_parquet(uri)
    frags = sorted(
        f for f in os.listdir(uri) if f.endswith(".parquet")
    ) if os.path.isdir(uri) else []
    rows = 0
    fields = []
    for f in frags:
        md = pq.read_metadata(os.path.join(uri, f))
        rows += md.num_rows
    if frags:
        sch = pq.read_schema(os.path.join(uri, frags[0]))
        fields = [{"name": n, "type": str(sch.field(n).type)} for n in sch.names]
    elif logical_schema is not None:
        fields = [{"name": f.name, "type": str(f.type)} for f in logical_schema]
    manifest = {
        "format": "lance-compat-parquet",
        "version": 1,
        "fragments": frags,
        "num_rows": rows,
        "schema": fields,
    }
    _atomic_write_json(os.path.join(uri, "_manifest.json"), manifest)
    return manifest


def finalize_fragment_dir(uri: str, note: str = "") -> dict:
    """Stamp an already-written parquet fragment directory with the
    lance-compat manifest (fragments + rows + schema + free-text note)."""
    frags = sorted(f for f in os.listdir(uri) if f.endswith(".parquet"))
    rows = 0
    fields = []
    for f in frags:
        rows += pq.read_metadata(os.path.join(uri, f)).num_rows
    if frags:
        sch = pq.read_schema(os.path.join(uri, frags[0]))
        fields = [{"name": n, "type": str(sch.field(n).type)} for n in sch.names]
    manifest = {
        "format": "lance-compat-parquet",
        "version": 1,
        "fragments": frags,
        "num_rows": rows,
        "schema": fields,
        "note": note,
    }
    _atomic_write_json(os.path.join(uri, "_manifest.json"), manifest)
    return manifest


def read_table(uri: str):
    """Read a lance(-compat) table back as a Ray Dataset."""
    import ray.data as rd

    if HAVE_LANCE and not os.path.exists(os.path.join(uri, "_manifest.json")):
        return rd.read_lance(uri)
    return rd.read_parquet(uri)


def read_manifest(uri: str) -> dict | None:
    p = os.path.join(uri, "_manifest.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


# ---------------------------------------------------------------------
# versioned manifests (Lance-style time travel on the compat layout)
# ---------------------------------------------------------------------

def append_table(ds, uri: str) -> dict:
    """Append a Ray Dataset's rows to a lance-compat table as NEW
    fragments and commit a NEW manifest version — the Lance append
    semantics on the parquet fallback. Fragment files are never
    rewritten (Ray names them uniquely per run), so every committed
    version's fragment list stays readable forever: version v is the
    snapshot `_versions/v{v}.json`, `_manifest.json` is the latest.
    Returns the committed manifest."""
    prior = read_manifest(uri)
    prior_frags = set(prior["fragments"]) if prior else set()
    version = int(prior.get("version", 1)) + 1 if prior else 1
    ds.write_parquet(uri)
    frags = sorted(f for f in os.listdir(uri) if f.endswith(".parquet"))
    rows = 0
    for f in frags:
        rows += pq.read_metadata(os.path.join(uri, f)).num_rows
    sch = pq.read_schema(os.path.join(uri, frags[0]))
    manifest = {
        "format": "lance-compat-parquet",
        "version": version,
        "fragments": frags,
        "new_fragments": sorted(set(frags) - prior_frags),
        "num_rows": rows,
        "schema": [{"name": n, "type": str(sch.field(n).type)}
                   for n in sch.names],
    }
    _atomic_write_json(
        os.path.join(uri, "_versions", f"v{version}.json"), manifest)
    _atomic_write_json(os.path.join(uri, "_manifest.json"), manifest)
    return manifest


def read_table_version(uri: str, version: int | None = None):
    """Time-travel read: the table AS OF a committed manifest version
    (None = latest). Only the fragments that version's snapshot lists
    are opened — later appends are invisible, exactly Lance's
    `dataset(version=...)` contract."""
    import ray.data as rd

    if version is None:
        m = read_manifest(uri)
    else:
        with open(os.path.join(uri, "_versions", f"v{version}.json")) as f:
            m = json.load(f)
    paths = [os.path.join(uri, f) for f in m["fragments"]]
    return rd.read_parquet(paths)
