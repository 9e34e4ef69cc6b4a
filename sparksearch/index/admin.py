"""Index administration: aliases and stats (the ``_aliases`` /
``_stats`` / ``_cat/indices`` analog).

OpenSearch aliases give a stable name an atomic pointer to a physical
index — the zero-downtime reindex pattern the reference's
``initialize_index`` (delete + recreate in place,
`keyword_search/functions/helper_functions.py:100-146`) conspicuously
lacks: its users lose the index for the whole rebuild.  Here an alias
is a JSON file next to the index dirs; ``swap_alias`` writes a temp
file and ``os.rename``s it over the old one — atomic on POSIX, so a
concurrent reader sees either the old or the new target, never a torn
state.  Open handles keep serving the index they resolved (exactly
OpenSearch's behavior: in-flight searches finish on the old index);
the next ``open_alias`` serves the new one.

``index_stats`` summarizes an index from its own metadata + one fs
walk — no Spark job, no data read — mirroring ``GET /<index>/_stats``
(doc count, token count, term count, generation, per-component bytes).
"""

from __future__ import annotations

import json
import os
from typing import Any

from sparksearch.index import manifest as mf

_COMPONENTS = (
    "postings",
    "tfrows",
    "stats",
    "doclens",
    "lexicon",
    "positions",
)


def _alias_doc(path: str) -> dict[str, Any]:
    with open(path) as f:
        doc = json.load(f)
    if not isinstance(doc, dict) or "index_dir" not in doc:
        raise ValueError(f"not an alias file: {path}")
    return doc


def create_alias(alias_path: str, index_dir: str) -> None:
    """Create a new alias pointing at ``index_dir``; refuses to
    overwrite (use :func:`swap_alias` to move an existing alias)."""
    if os.path.exists(alias_path):
        raise FileExistsError(alias_path)
    _write_alias(alias_path, index_dir, gen=0)


def swap_alias(alias_path: str, index_dir: str) -> int:
    """Atomically repoint an existing alias → new alias generation."""
    doc = _alias_doc(alias_path)
    gen = int(doc.get("gen", 0)) + 1
    _write_alias(alias_path, index_dir, gen=gen)
    return gen


def _write_alias(alias_path: str, index_dir: str, *, gen: int) -> None:
    if not os.path.isfile(os.path.join(index_dir, "meta.json")):
        raise FileNotFoundError(
            f"{index_dir} is not a built index (no meta.json)"
        )
    tmp = alias_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"index_dir": os.path.abspath(index_dir), "gen": gen}, f)
    os.rename(tmp, alias_path)  # atomic pointer swap


def resolve_alias(alias_path: str) -> str:
    """Alias file → the physical index dir it currently points at."""
    return _alias_doc(alias_path)["index_dir"]


def open_alias(spark, alias_path: str, **kw):
    """Open an :class:`InvertedIndex` handle on the alias's CURRENT
    target.  The handle stays bound to that physical index (in-flight
    semantics); re-open to follow a later swap."""
    from sparksearch.query.topk import InvertedIndex

    return InvertedIndex(spark, resolve_alias(alias_path), **kw)


def _tree_bytes(root: str) -> tuple[int, int]:
    total = files = 0
    for dirpath, _, names in os.walk(root):
        for n in names:
            p = os.path.join(dirpath, n)
            try:
                total += os.path.getsize(p)
            except OSError:
                continue
            files += 1
    return total, files


def index_stats(index_dir: str) -> dict[str, Any]:
    """``GET /<index>/_stats`` analog from metadata + one fs walk."""
    meta = mf.read_meta(index_dir)
    comps: dict[str, dict[str, int]] = {}
    total = 0
    for name in _COMPONENTS:
        d = os.path.join(index_dir, name)
        if not os.path.isdir(d):
            continue
        b, nf = _tree_bytes(d)
        comps[name] = {"bytes": b, "files": nf}
        total += b
    return {
        "index_dir": os.path.abspath(index_dir),
        "n_docs": int(meta.get("n_docs", 0)),
        "total_tokens": int(meta.get("total_tokens", 0)),
        "avgdl": float(meta.get("avgdl", 0.0)),
        "gen": int(meta.get("gen", 0)),
        "n_segments": int(meta.get("n_segments", 0)),
        "n_buckets": int(meta.get("n_buckets", 0)),
        "version": meta.get("version"),
        "analyzer": meta.get("analyzer", "ascii"),
        "keep_tfrows": bool(meta.get("keep_tfrows", True)),
        "components": comps,
        "total_bytes": total,
    }
