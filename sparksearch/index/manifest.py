"""Segment-manifest checkpointing — the engine's resume contract.

The reference checkpoints between pipeline stages with Luigi
``LocalTarget`` summary-JSON files (``semantic_search/classes/
luigi_tasks.py:31-49``) and re-runs from a forced stage with
``force_from`` (``functions/luigi_helper.py:9-44``).  Here the same
capability is a manifest directory next to the index: one JSON document
per completed build *unit* (a group of term buckets) plus one per
completed stage, each carrying lineage counters (rows/blocks/bytes).

On restart, :func:`sparksearch.index.build.build_index` with
``resume=True`` anti-joins pending units against completed manifest rows
and only re-runs the missing ones.  Writes are atomic (tmp + rename).
On a real deployment this directory becomes an Iceberg table and the
rename becomes a snapshot commit; the sandbox has no Iceberg jars
(parquet fallback), so the contract is kept filesystem-level here.
"""

from __future__ import annotations

import json
import os
from typing import Any

MANIFEST_DIR = "manifest"


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, MANIFEST_DIR)


def write_entry(index_dir: str, name: str, payload: dict[str, Any]) -> None:
    mdir = _manifest_path(index_dir)
    os.makedirs(mdir, exist_ok=True)
    final = os.path.join(mdir, f"{name}.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"name": name, "status": "complete", **payload}, f, indent=1, sort_keys=True)
    os.replace(tmp, final)


def read_entry(index_dir: str, name: str) -> dict[str, Any] | None:
    path = os.path.join(_manifest_path(index_dir), f"{name}.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        entry = json.load(f)
    return entry if entry.get("status") == "complete" else None


def remove_entry(index_dir: str, name: str) -> None:
    path = os.path.join(_manifest_path(index_dir), f"{name}.json")
    if os.path.exists(path):
        os.remove(path)


def clear_unit_entries(index_dir: str) -> None:
    """Drop every ``unit_*`` completion marker.

    Called whenever stage A re-runs (its ``stage_tfrows`` marker is
    absent): committed units would otherwise be skipped by a subsequent
    ``resume=True`` even though the tfrows they were packed from have
    been rewritten — safe only if the input was byte-identical, which
    resume cannot verify (ADVICE r2).  Clearing forces a full repack
    after any tfrows rewrite.
    """
    mdir = _manifest_path(index_dir)
    if not os.path.isdir(mdir):
        return
    for fn in os.listdir(mdir):
        if fn.startswith("unit_") and fn.endswith(".json"):
            os.remove(os.path.join(mdir, fn))


def completed_units(index_dir: str) -> set[int]:
    mdir = _manifest_path(index_dir)
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for fn in os.listdir(mdir):
        if fn.startswith("unit_") and fn.endswith(".json"):
            entry = read_entry(index_dir, fn[: -len(".json")])
            if entry is not None:
                done.add(int(entry["unit"]))
    return done


def write_meta(index_dir: str, meta: dict[str, Any]) -> None:
    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(index_dir, "meta.json"))


def read_meta(index_dir: str) -> dict[str, Any]:
    with open(os.path.join(index_dir, "meta.json")) as f:
        return json.load(f)
