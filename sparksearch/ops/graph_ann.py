"""Graph-ANN: per-shard HNSW with shard fan-out and exact re-rank.

The reference's kNN is HNSW inside OpenSearch
(``semantic_search/functions/opensearch_loader.py:55-67``: ``m: 24,
ef_construction: 128``), and OpenSearch/Lucene builds ONE graph per
segment, fans each query out over segments, and merges the per-segment
top-k.  That per-segment architecture is exactly the shape that survives
a 100 TB corpus, and it maps 1:1 onto Spark:

* **Build** — shard vectors by ``pmod(vec_id, n_shards)``, then
  ``applyInPandas`` per shard: a deterministic numpy HNSW insert loop
  (levels drawn from a splitmix64 hash of ``vec_id``, not an RNG, so the
  graph is a pure function of the shard's contents — independent of
  Spark parallelism, partitioning, or row order).  Each shard's graph is
  built by one task; shards build embarrassingly parallel, the same way
  Lucene segments do.  At cluster scale ``n_shards`` tracks the
  executor count and each shard holds ~10⁶ vectors; nothing is
  corpus-global.
* **Persist** — ``graph/`` parquet partitioned by ``shard``: one row per
  node carrying its vector, level, and per-level adjacency
  (``array<array<long>>`` of neighbor vec_ids).  A query reads only
  ``shard=`` directories (all of them — graphs answer for their own
  shard, like segments).
* **Query** — ``applyInPandas`` per shard runs the standard greedy
  descent + ef-bounded best-first search (Malkov & Yashunin 2016,
  alg. 2/5) and emits the shard-local top-k CANDIDATES; the global
  answer re-ranks candidates with the exact JVM cosine (``zip_with`` +
  ``aggregate``, same kernel as :func:`~sparksearch.ops.similarity
  .cosine_topk`) and takes the global top-k.  Candidate generation is
  approximate; scoring is exact — the production ANN contract.

Determinism: level assignment is hashed, all heap entries are
``(distance, vec_id)`` tuples (total order), insertion is in ascending
``vec_id`` order, and per-shard membership is a pure function of
``vec_id`` — so build twice (at any parallelism) → byte-identical
graph, and search is a pure function of (graph, query).  Tested in
``tests/test_graph_ann.py``.

Recall accounting: ``bench.py`` reports measured recall@10 vs the exact
scan (``ann_recall_hnsw_at10``); the driver gate (``sim_hnsw``) is valid
against the EXACT-cosine oracle because at gate scale the measured
recall is 1.0 (asserted in tests — if a future parameter change broke
that, the pytest recall gate fails before the driver gate would).
"""

from __future__ import annotations

import heapq
import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparksearch.ops.similarity import ROUND, _dot, _norm

DEFAULT_M = 8
DEFAULT_EF_CONSTRUCTION = 64
DEFAULT_EF_SEARCH = 64

# ~1M vectors per shard — Lucene-segment-sized graphs whose count tracks
# the executor fleet at corpus scale; floor 4 keeps shard fan-out (and
# its determinism guarantees) exercised even on toy corpora
SHARD_VECS_TARGET = 1_000_000


def auto_hnsw_shards(n_vecs: int) -> int:
    """corpus size → n_shards (one graph-build task per shard)."""
    return max(4, -(-int(n_vecs) // SHARD_VECS_TARGET))

_MASK64 = (1 << 64) - 1


def _level_of(vec_id: int, mL: float) -> int:
    """Deterministic HNSW level: splitmix64(vec_id) → U(0,1] → geometric."""
    z = (vec_id + 0x9E3779B97F4A7C15) & _MASK64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK64
    z = z ^ (z >> 31)
    u = ((z >> 11) + 1) / float(1 << 53)  # (0, 1]
    return int(-math.log(u) * mL)


def _search_layer(mat, links, q, entry_points, ef: int, level: int):
    """ef-bounded best-first search on one layer (M&Y alg. 2).

    Returns ascending [(dist, idx)] of at most ``ef`` nodes.  Distances
    are cosine distance over unit vectors (1 - dot).  Neighbor distances
    are computed as one numpy matvec per expansion, not per edge.
    """
    visited = set(entry_points)
    cand = []   # min-heap (dist, idx)
    res = []    # max-heap (-dist, idx), size <= ef
    for ep in entry_points:
        d = 1.0 - float(mat[ep] @ q)
        heapq.heappush(cand, (d, ep))
        heapq.heappush(res, (-d, ep))
    while len(res) > ef:
        heapq.heappop(res)
    while cand:
        d, c = heapq.heappop(cand)
        if len(res) >= ef and d > -res[0][0]:
            break
        nbrs = [nb for nb in links[c][level] if nb not in visited]
        if not nbrs:
            continue
        visited.update(nbrs)
        dn = 1.0 - mat[np.asarray(nbrs, dtype=np.int64)] @ q
        for nb, dv in zip(nbrs, dn):
            dv = float(dv)
            if len(res) < ef or dv < -res[0][0]:
                heapq.heappush(cand, (dv, nb))
                heapq.heappush(res, (-dv, nb))
                if len(res) > ef:
                    heapq.heappop(res)
    return sorted((-nd, i) for nd, i in res)


def _select_neighbors(mat, cands, m: int):
    """Diversity-heuristic neighbor selection (M&Y alg. 4).

    ``cands`` is ascending ``[(dist_to_q, idx)]``.  A candidate ``e`` is
    kept only if no already-kept neighbor is closer to ``e`` than ``q``
    is — pruning same-direction edges so clusters stay mutually
    reachable (naive closest-``m`` selection spends every link inside
    the local cluster and disconnects the graph on tightly clustered
    data; bench measured recall@10 0.8625 → 1.0 from this change).
    Pruned candidates backfill remaining slots in ascending order
    (``keepPrunedConnections``).  Deterministic: candidate order is.
    """
    selected: list[int] = []
    pruned: list[int] = []
    for d, e in cands:
        if len(selected) >= m:
            break
        ve = mat[e]
        if all(1.0 - float(ve @ mat[s]) >= d for s in selected):
            selected.append(e)
        else:
            pruned.append(e)
    for e in pruned:
        if len(selected) >= m:
            break
        selected.append(e)
    return selected


def _build_graph(ids: np.ndarray, mat: np.ndarray, m: int, ef_construction: int):
    """Insert all nodes (ascending vec_id order) into a fresh HNSW.

    ``mat`` rows must be unit-normalized float64.  Returns
    (levels: list[int], links: list[list[list[int]]] local indices,
    entry: int local index).
    """
    n = len(ids)
    mL = 1.0 / math.log(m)
    m0 = 2 * m
    levels = [_level_of(int(v), mL) for v in ids]
    links = [[[] for _ in range(lv + 1)] for lv in levels]
    entry, max_level = -1, -1
    for i in range(n):
        lv = levels[i]
        if entry < 0:
            entry, max_level = i, lv
            continue
        q = mat[i]
        eps = [entry]
        for layer in range(max_level, lv, -1):
            eps = [_search_layer(mat, links, q, eps, 1, layer)[0][1]]
        for layer in range(min(lv, max_level), -1, -1):
            found = _search_layer(mat, links, q, eps, ef_construction, layer)
            mmax = m0 if layer == 0 else m
            sel = _select_neighbors(mat, found, m)
            links[i][layer] = list(sel)
            for s in sel:
                ls = links[s][layer]
                ls.append(i)
                if len(ls) > mmax:
                    # re-select with the same diversity heuristic
                    # (ties broken by index — deterministic)
                    arr = np.asarray(ls, dtype=np.int64)
                    ds = 1.0 - mat[arr] @ mat[s]
                    cands = sorted(zip(ds.tolist(), ls))
                    links[s][layer] = _select_neighbors(mat, cands, mmax)
            eps = [idx for _, idx in found]
        if lv > max_level:
            entry, max_level = i, lv
    return levels, links, entry


def _graph_entry(ids, levels):
    """Entry node = highest level, ties → smallest vec_id (deterministic;
    recomputed from persisted levels so no separate entry table)."""
    best = max(range(len(ids)), key=lambda i: (levels[i], -int(ids[i])))
    return best


_GRAPH_SCHEMA = (
    "shard int, vec_id long, node_level int, "
    "nbrs array<array<long>>, v array<float>"
)


def _build_shard_pdf(pdf, m: int, ef_construction: int):
    import pandas as pd

    if len(pdf) == 0:
        return pd.DataFrame(
            {"shard": [], "vec_id": [], "node_level": [], "nbrs": [], "v": []}
        )
    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    mat = mat / norms[:, None]
    levels, links, _ = _build_graph(ids, mat, m, ef_construction)
    nbrs = [
        [[int(ids[j]) for j in layer] for layer in links[i]]
        for i in range(len(ids))
    ]
    return pd.DataFrame(
        {
            "shard": pdf["shard"],
            "vec_id": pdf["vec_id"],
            "node_level": levels,
            "nbrs": nbrs,
            "v": [np.asarray(r, dtype=np.float32) for r in pdf["v"]],
        }
    )


def build_hnsw_graph(
    emb: DataFrame,
    n_shards: int = 4,
    m: int = DEFAULT_M,
    ef_construction: int = DEFAULT_EF_CONSTRUCTION,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-shard HNSW graphs as a DataFrame (one row per node).

    One ``applyInPandas`` task per shard; the graph is a pure function
    of the shard's (vec_id, vector) set, so the result is identical at
    any Spark parallelism."""
    base = emb.filter(F.col(vec_col).isNotNull()).select(
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).cast("array<float>").alias("v"),
    )
    return base.groupBy("shard").applyInPandas(
        lambda pdf: _build_shard_pdf(pdf, m, ef_construction), _GRAPH_SCHEMA
    )


def _search_shard_pdf(pdf, qv64: np.ndarray, k: int, ef_search: int,
                      exclude_vec_id):
    import pandas as pd

    if len(pdf) == 0:
        return pd.DataFrame({"vec_id": []})
    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    idx_of = {int(v): i for i, v in enumerate(ids)}
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    mat = mat / norms[:, None]
    links = [
        [[idx_of[int(x)] for x in layer] for layer in row]
        for row in pdf["nbrs"]
    ]
    levels = pdf["node_level"].to_list()
    entry = _graph_entry(ids, levels)
    qn = float(np.linalg.norm(qv64))
    q = qv64 / (qn if qn else 1.0)
    eps = [entry]
    for layer in range(levels[entry], 0, -1):
        eps = [_search_layer(mat, links, q, eps, 1, layer)[0][1]]
    found = _search_layer(mat, links, q, eps, ef_search, 0)
    out_ids = [int(ids[i]) for _, i in found if int(ids[i]) != exclude_vec_id]
    return pd.DataFrame({"vec_id": out_ids[: max(k, 1)]})


def hnsw_candidates(
    graph: DataFrame,
    query_vec,
    k: int = 10,
    ef_search: int = DEFAULT_EF_SEARCH,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Shard fan-out: per-shard HNSW search → shard-local top-k
    candidate vec_ids (one ``applyInPandas`` task per shard)."""
    qv64 = np.asarray(query_vec, dtype=np.float64)
    excl = -1 if exclude_vec_id is None else int(exclude_vec_id)
    return graph.groupBy("shard").applyInPandas(
        lambda pdf: _search_shard_pdf(pdf, qv64, k, ef_search, excl),
        "vec_id long",
    )


# ---------------------------------------------------------------------------
# filtered kNN (Lucene "efficient filtering" semantics)
# ---------------------------------------------------------------------------

def _search_layer_filtered(mat, links, q, entry_points, ef: int,
                           level: int, allowed, visited_limit: int):
    """Filtered layer search: traversal routes through ALL nodes (the
    graph stays navigable) but only ``allowed`` indices may enter the
    result heap — Lucene's FilteredNearestNeighbor traversal.  Aborts
    and returns ``None`` once more than ``visited_limit`` nodes have
    been visited: past that point an exact scan of the allowed set is
    cheaper, so the caller cuts over (Lucene's visitedLimit cost
    fallback, ``Lucene90HnswVectorsReader.search``)."""
    visited = set(entry_points)
    cand = []   # min-heap (dist, idx) — routing frontier, unfiltered
    res = []    # max-heap (-dist, idx), allowed only, size <= ef
    for ep in entry_points:
        d = 1.0 - float(mat[ep] @ q)
        heapq.heappush(cand, (d, ep))
        if ep in allowed:
            heapq.heappush(res, (-d, ep))
    while len(res) > ef:
        heapq.heappop(res)
    while cand:
        d, c = heapq.heappop(cand)
        if len(res) >= ef and d > -res[0][0]:
            break
        nbrs = [nb for nb in links[c][level] if nb not in visited]
        if not nbrs:
            continue
        visited.update(nbrs)
        if len(visited) > visited_limit:
            return None
        dn = 1.0 - mat[np.asarray(nbrs, dtype=np.int64)] @ q
        for nb, dv in zip(nbrs, dn):
            dv = float(dv)
            if len(res) < ef or dv < -res[0][0]:
                heapq.heappush(cand, (dv, nb))
                if nb in allowed:
                    heapq.heappush(res, (-dv, nb))
                    if len(res) > ef:
                        heapq.heappop(res)
    return sorted((-nd, i) for nd, i in res)


def _search_shard_filtered_pdf(pdf, qv64: np.ndarray, k: int,
                               ef_search: int, exclude_vec_id):
    """Per-shard filtered search.  ``pdf`` carries a boolean ``pass``
    column (filter membership, joined Spark-side so no filter set ever
    rides the driver).  Exact-scan fallback fires when (a) the shard's
    passing set is no bigger than ``ef_search`` — a scan is cheaper and
    recall-1 by construction — or (b) the graph walk visits more nodes
    than the passing count (Lucene's visitedLimit rule)."""
    import pandas as pd

    if len(pdf) == 0:
        return pd.DataFrame({"vec_id": []})
    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    idx_of = {int(v): i for i, v in enumerate(ids)}
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    mat = mat / norms[:, None]
    qn = float(np.linalg.norm(qv64))
    q = qv64 / (qn if qn else 1.0)
    allowed = {
        i for i, (ok, v) in enumerate(zip(pdf["pass"], ids))
        if ok and int(v) != exclude_vec_id
    }
    if not allowed:
        return pd.DataFrame({"vec_id": []})

    def exact():
        rows = sorted(allowed)
        d = 1.0 - mat[np.asarray(rows, dtype=np.int64)] @ q
        order = sorted(zip(d, rows))[: max(k, 1)]
        return pd.DataFrame({"vec_id": [int(ids[i]) for _, i in order]})

    if len(allowed) <= max(ef_search, k):
        return exact()
    links = [
        [[idx_of[int(x)] for x in layer] for layer in row]
        for row in pdf["nbrs"]
    ]
    levels = pdf["node_level"].to_list()
    entry = _graph_entry(ids, levels)
    eps = [entry]
    for layer in range(levels[entry], 0, -1):
        eps = [_search_layer(mat, links, q, eps, 1, layer)[0][1]]
    found = _search_layer_filtered(
        mat, links, q, eps, ef_search, 0, allowed, len(allowed))
    if found is None:  # visited-limit hit → exact scan is cheaper
        return exact()
    return pd.DataFrame({"vec_id": [int(ids[i]) for _, i in found][: max(k, 1)]})


def filtered_hnsw_candidates(
    graph: DataFrame,
    query_vec,
    filter_ids: DataFrame,
    k: int = 10,
    ef_search: int = DEFAULT_EF_SEARCH,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Shard fan-out of the filtered search.  The filter joins INTO the
    graph frame as a boolean column before the per-shard task — the
    filter set is distributed state, never a driver-side collection, so
    a 10^9-id filter costs one (broadcastable) join."""
    qv64 = np.asarray(query_vec, dtype=np.float64)
    excl = -1 if exclude_vec_id is None else int(exclude_vec_id)
    marks = (
        filter_ids.select(F.col(filter_ids.columns[0]).cast("long").alias("vec_id"))
        .distinct()
        .withColumn("pass", F.lit(True))
    )
    marked = graph.join(marks, "vec_id", "left").withColumn(
        "pass", F.coalesce(F.col("pass"), F.lit(False))
    )
    return marked.groupBy("shard").applyInPandas(
        lambda pdf: _search_shard_filtered_pdf(pdf, qv64, k, ef_search, excl),
        "vec_id long",
    )


def filtered_hnsw_topk(
    emb: DataFrame,
    query_vec_id: int,
    filter_ids: DataFrame,
    k: int = 10,
    n_shards: int = 4,
    m: int = DEFAULT_M,
    ef_construction: int = DEFAULT_EF_CONSTRUCTION,
    ef_search: int = DEFAULT_EF_SEARCH,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    graph: DataFrame | None = None,
) -> DataFrame:
    """Filtered HNSW top-k: OpenSearch's ``knn`` query with ``filter``.

    The filter is PRE-applied (Lucene semantics: scores and the k cut
    see only passing docs — reference delegates this to OpenSearch,
    ``semantic_search/functions/opensearch_loader.py:55-67`` builds the
    HNSW index it runs on).  Candidates come from the per-shard filtered
    walk (exact-scan fallback per shard when the filter is selective);
    the final re-rank is the exact JVM cosine restricted to the filter
    set, so output ⊆ filter always holds and values are bit-compatible
    with :func:`~sparksearch.ops.similarity.cosine_topk`'s filtered
    exact path."""
    if graph is None:
        graph = build_hnsw_graph(emb, n_shards, m, ef_construction, id_col, vec_col)
    qrow = (
        emb.filter(F.col(id_col) == query_vec_id)
        .select(F.col(vec_col).cast("array<double>").alias("qv"))
        .head()
    )
    if qrow is None:
        raise KeyError(f"query_vec_id {query_vec_id} not found")
    cand = filtered_hnsw_candidates(
        graph, qrow["qv"], filter_ids, k, ef_search, query_vec_id)
    qlit = F.lit(list(qrow["qv"])).cast("array<double>")
    base = emb.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("ev")
    )
    scored = base.join(cand, "vec_id", "leftsemi").select(
        "vec_id",
        (_dot(F.col("ev"), qlit) / (_norm(F.col("ev")) * _norm(qlit))).alias("raw"),
    )
    return (
        scored.orderBy(F.desc("raw"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("raw", ROUND).alias("cos"))
    )


def hnsw_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_shards: int = 4,
    m: int = DEFAULT_M,
    ef_construction: int = DEFAULT_EF_CONSTRUCTION,
    ef_search: int = DEFAULT_EF_SEARCH,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    graph: DataFrame | None = None,
) -> DataFrame:
    """HNSW top-k of ``query_vec_id``'s vector vs all other rows.

    Candidates come from the per-shard graphs; scores are the EXACT JVM
    cosine over the candidate set (same expression as ``cosine_topk``,
    so output values are bit-compatible with the exact engine and the
    DuckDB oracle).  Output (vec_id, cos) ordered by raw desc / vec_id
    asc — identical shape to :func:`cosine_topk`."""
    if graph is None:
        graph = build_hnsw_graph(emb, n_shards, m, ef_construction, id_col, vec_col)
    qrow = (
        emb.filter(F.col(id_col) == query_vec_id)
        .select(F.col(vec_col).cast("array<double>").alias("qv"))
        .head()
    )
    if qrow is None:
        raise KeyError(f"query_vec_id {query_vec_id} not found")
    cand = hnsw_candidates(graph, qrow["qv"], k, ef_search, query_vec_id)
    qlit = F.lit(list(qrow["qv"])).cast("array<double>")
    base = emb.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("ev")
    )
    scored = base.join(cand, "vec_id", "leftsemi").select(
        "vec_id",
        (_dot(F.col("ev"), qlit) / (_norm(F.col("ev")) * _norm(qlit))).alias("raw"),
    )
    return (
        scored.orderBy(F.desc("raw"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("raw", ROUND).alias("cos"))
    )


# ---------------------------------------------------------------------------
# persisted index
# ---------------------------------------------------------------------------

def build_hnsw_index(
    spark,
    emb: DataFrame,
    index_dir: str,
    n_shards: int = 4,
    m: int = DEFAULT_M,
    ef_construction: int = DEFAULT_EF_CONSTRUCTION,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist per-shard HNSW graphs: ``graph/shard=<s>/`` parquet (node
    rows carry vector + adjacency — one read serves search) + meta.json."""
    import json
    import os

    g = build_hnsw_graph(emb, n_shards, m, ef_construction, id_col, vec_col)
    g.write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(index_dir, "graph")
    )
    os.makedirs(index_dir, exist_ok=True)
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(
            {"kind": "hnsw", "n_shards": n_shards, "m": m,
             "ef_construction": ef_construction}, f)


class HnswIndex:
    """Handle to a persisted per-shard HNSW index.

    Precision note (ADVICE r3): the persisted graph stores vectors as
    ``array<float>`` (float32 — halves the index footprint), and
    ``topk`` re-ranks against THOSE, while :func:`hnsw_topk` re-ranks
    against the caller's original embedding column.  For float32 source
    embeddings (the canonical table) the two are bit-identical; for an
    ``array<double>`` source the persisted-index scores can differ past
    the 4-decimal ROUND in rare near-tie cases."""

    def __init__(self, spark, index_dir: str):
        import json
        import os

        self.spark = spark
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.graph_path = os.path.join(index_dir, "graph")

    def topk(
        self,
        query_vec,
        k: int = 10,
        ef_search: int = DEFAULT_EF_SEARCH,
        exclude_vec_id: int | None = None,
    ) -> DataFrame:
        """Cosine top-k via shard fan-out + exact re-rank on candidates."""
        graph = self.spark.read.parquet(self.graph_path)
        cand = hnsw_candidates(graph, query_vec, k, ef_search, exclude_vec_id)
        qlit = F.lit([float(x) for x in query_vec]).cast("array<double>")
        nodes = graph.select("vec_id", F.col("v").alias("emb"))
        scored = nodes.join(cand, "vec_id", "leftsemi").select(
            "vec_id",
            (_dot(F.col("emb"), qlit) / (_norm(F.col("emb")) * _norm(qlit))).alias("raw"),
        )
        return (
            scored.orderBy(F.desc("raw"), F.asc("vec_id"))
            .limit(k)
            .select("vec_id", F.round("raw", ROUND).alias("cos"))
        )
