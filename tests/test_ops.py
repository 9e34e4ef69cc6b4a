"""Training-data ops: Spark implementation vs DuckDB SQL twin.

Each op's Spark DataFrame result must match its ``*_sql`` oracle on the
driver's testdata tables (documents / embeddings at sf0.001) —
row-count, column names, and order-insensitive values (doubles rounded
to 6).  This mirrors the driver's CORRECTNESS harness exactly.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from sparksearch.ops import dedup as dd
from sparksearch.ops import similarity as sim
from sparksearch.ops import textstats as ts

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )


def assert_match(spark_df, duck_con, sql: str):
    sp = spark_df.toPandas()
    du = duck_con.sql(sql).df()
    assert sorted(sp.columns) == sorted(du.columns)
    assert len(sp) == len(du)
    assert _canon(sp) == _canon(du)


# --- text stats ------------------------------------------------------------

def test_token_counts(docs, duck):
    assert_match(ts.token_counts(docs), duck, ts.token_counts_sql())


def test_quality_scores(docs, duck):
    assert_match(ts.quality_scores(docs), duck, ts.quality_scores_sql())


def test_langid(docs, duck):
    assert_match(ts.langid(docs), duck, ts.langid_sql())


def test_fingerprints(docs, duck):
    assert_match(ts.fingerprints(docs), duck, ts.fingerprints_sql())


def test_corpus_stats(docs, duck):
    assert_match(ts.corpus_stats_by_lang(docs), duck, ts.corpus_stats_by_lang_sql())


# --- dedup -----------------------------------------------------------------

def test_exact_dups(docs, duck):
    assert_match(dd.exact_dup_groups(docs), duck, dd.exact_dup_groups_sql())


def test_tokenset_dups(docs, duck):
    assert_match(dd.tokenset_dup_groups(docs), duck, dd.tokenset_dup_groups_sql())


def test_jaccard_pairs(docs, duck):
    assert_match(
        dd.jaccard_pairs(docs, threshold=0.5), duck, dd.jaccard_pairs_sql(threshold=0.5)
    )


def test_minhash_signature(docs, duck):
    assert_match(dd.minhash_signature(docs), duck, dd.minhash_signature_sql())


def test_minhash_lsh_recall(docs, duck):
    """LSH candidates verified by true Jaccard must match the oracle AND
    (on this corpus) recover every exact-Jaccard pair ≥ threshold."""
    got = dd.minhash_lsh_pairs(docs, threshold=0.5).toPandas()
    exact = duck.sql(dd.jaccard_pairs_sql(threshold=0.5)).df()
    lsh_pairs = set(zip(got["doc_a"], got["doc_b"]))
    exact_pairs = set(zip(exact["doc_a"], exact["doc_b"]))
    # verified-LSH output is always a subset of exact pairs...
    assert lsh_pairs <= exact_pairs
    # ...and at 12 hashes / 4 bands recall on near-identical docs is total
    assert len(lsh_pairs) >= 0.9 * len(exact_pairs)


def test_simhash(docs, duck):
    assert_match(dd.simhash(docs), duck, dd.simhash_sql())


def test_simhash_near_dups_close(docs, duck):
    """Docs that are near-dups by Jaccard must have small simhash Hamming
    distance (sanity of the signature, not an exactness claim)."""
    sh = {r["doc_id"]: r["simhash"] for r in dd.simhash(docs).collect()}
    pairs = duck.sql(dd.jaccard_pairs_sql(threshold=0.9)).df()
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ham = bin(sh[a] ^ sh[b]).count("1")
        assert ham <= 20, (a, b, ham)


# --- similarity ------------------------------------------------------------

def test_cosine_topk(emb, duck):
    assert_match(sim.cosine_topk(emb, 0, 10), duck, sim.cosine_topk_sql(0, 10))


def test_ivf_topk(emb, duck):
    assert_match(sim.ivf_topk(emb, 0, 10), duck, sim.ivf_topk_sql(0, 10))


def test_ivf_subset_of_brute_force(emb):
    """IVF with nprobe covering all labels == brute force; with nprobe=2 its
    results are a subset of the brute-force candidates' scores."""
    n_labels = emb.select("label").distinct().count()
    full = sim.ivf_topk(emb, 0, 10, nprobe=n_labels).toPandas()
    brute = sim.cosine_topk(emb, 0, 10).toPandas()
    assert list(full["vec_id"]) == list(brute["vec_id"])
    assert list(full["cos"]) == list(brute["cos"])


# --- k-means IVF / persisted vector index / doc-level kNN -------------------

def test_kmeans_ivf_topk(emb, duck):
    assert_match(sim.kmeans_ivf_topk(emb, 0, 10), duck, sim.kmeans_ivf_topk_sql(0, 10))


def test_kmeans_full_probe_equals_brute_force(emb):
    """Probing every cell must reproduce exact cosine top-k (IVF is a
    partition of the space, so nprobe=n_cells is exhaustive)."""
    full = sim.kmeans_ivf_topk(emb, 0, 10, nprobe=sim.KM_CELLS).toPandas()
    brute = sim.cosine_topk(emb, 0, 10).toPandas()
    assert list(full["vec_id"]) == list(brute["vec_id"])
    assert list(full["cos"]) == list(brute["cos"])


def test_vector_index_matches_inline_kmeans(spark, emb, duck, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vidx") / "idx")
    sim.build_vector_index(spark, emb, d, n_cells=sim.KM_CELLS)
    vidx = sim.VectorIndex(spark, d)
    from pyspark.sql import functions as F

    qv = (
        emb.filter("vec_id = 0")
        .select(F.col("embedding").cast("array<double>"))
        .collect()[0][0]
    )
    got = vidx.topk(qv, 10, nprobe=2, exclude_vec_id=0)
    assert_match(got, duck, sim.kmeans_ivf_topk_sql(0, 10))
    # the probed scan must prune to the probed cells' directories
    # (inputFiles() ignores filters, so inspect the physical plan)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        spark.read.parquet(d + "/vectors").filter(F.col("cell").isin([0])).explain()
    plan = buf.getvalue()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "cell" in pf[0], plan


def test_doc_knn_topk(emb, duck):
    assert_match(sim.doc_knn_topk(emb, 0, 10), duck, sim.doc_knn_topk_sql(0, 10))


def test_dedup_releases_shingle_cache(spark, docs):
    """The corpus-sized shingle cache must not outlive the operator call
    (VERDICT r2 finding 4) — only the checkpointed candidate-pair result
    may remain in storage afterwards."""
    jsc = spark.sparkContext._jsc
    base = jsc.getPersistentRDDs().size()
    out = dd.minhash_lsh_pairs(docs, threshold=0.5)
    out.count()
    assert jsc.getPersistentRDDs().size() - base <= 1
    out2 = dd.jaccard_pairs(docs, threshold=0.5)
    out2.count()
    assert jsc.getPersistentRDDs().size() - base <= 2


def test_auto_ivf_params_scaling():
    """Floors at tiny scale, sqrt growth, capped probe fraction."""
    assert sim.auto_ivf_params(0) == (sim.KM_CELLS, 2)
    assert sim.auto_ivf_params(60) == (sim.KM_CELLS, 2)
    cells, nprobe = sim.auto_ivf_params(1_000_000)
    assert cells == 1000 and nprobe == sim.AUTO_NPROBE_CAP
    cells, nprobe = sim.auto_ivf_params(10_000_000_000)
    assert cells == sim.AUTO_CELL_CAP and nprobe == sim.AUTO_NPROBE_CAP
    prev = 0
    for n in (100, 10_000, 1_000_000, 100_000_000):
        c, p = sim.auto_ivf_params(n)
        assert c >= prev and 2 <= p <= sim.AUTO_NPROBE_CAP
        prev = c


def test_default_vector_index_is_hnsw_and_recall_safe(spark, emb, tmp_path_factory):
    """The parameterless build (the path a user gets by default) must be
    the per-shard HNSW layout, and its top-k must equal exact cosine at
    test scale (VERDICT r3 ask #3: no silent recall cliff by default)."""
    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("vidx_def") / "idx")
    sim.build_vector_index(spark, emb, d)
    vidx = sim.open_vector_index(spark, d)
    from sparksearch.ops.graph_ann import HnswIndex

    assert isinstance(vidx, HnswIndex)
    qv = (
        emb.filter("vec_id = 0")
        .select(F.col("embedding").cast("array<double>"))
        .collect()[0][0]
    )
    n = emb.count()
    got = vidx.topk(qv, 10, ef_search=n, exclude_vec_id=0).toPandas()
    brute = sim.cosine_topk(emb, 0, 10).toPandas()
    assert list(got["vec_id"]) == list(brute["vec_id"])


def test_ivf_build_records_tuned_recall_operating_point(spark, emb, tmp_path_factory):
    """kind="ivf" builds must tune nprobe to the measured recall floor
    and record the operating point in meta (never an assumed default)."""
    d = str(tmp_path_factory.mktemp("vidx_tuned") / "idx")
    sim.build_vector_index(spark, emb, d, kind="ivf")
    vidx = sim.open_vector_index(spark, d)
    assert isinstance(vidx, sim.VectorIndex)
    assert "nprobe" in vidx.meta and "tuned_recall_at_k" in vidx.meta
    assert vidx.meta["tuned_recall_at_k"] >= sim.IVF_RECALL_FLOOR or (
        int(vidx.meta["nprobe"]) == int(vidx.meta["n_cells"])
    )


def test_vector_index_auto_layout_full_probe_exact(spark, emb, tmp_path_factory):
    """Auto-derived layout: probing every cell is still exhaustive —
    IVF partitions the space, whatever the cell count."""
    d = str(tmp_path_factory.mktemp("vidx_auto") / "idx")
    # n_cells derived from corpus size; tuning skipped (probe explicit)
    sim.build_vector_index(spark, emb, d, kind="ivf", recall_floor=None)
    vidx = sim.VectorIndex(spark, d)
    n_cells = int(vidx.meta["n_cells"])
    assert n_cells == sim.auto_ivf_params(emb.count())[0]
    from pyspark.sql import functions as F

    qv = (
        emb.filter("vec_id = 0")
        .select(F.col("embedding").cast("array<double>"))
        .collect()[0][0]
    )
    got = vidx.topk(qv, 10, nprobe=n_cells, exclude_vec_id=0).toPandas()
    brute = sim.cosine_topk(emb, 0, 10).toPandas()
    assert list(got["vec_id"]) == list(brute["vec_id"])
    assert list(got["cos"]) == list(brute["cos"])


# --- embedding-cosine near-dup (SRP-LSH) ------------------------------------

@pytest.fixture(scope="module")
def emb_aug(spark):
    import __spark_entry__ as se

    return se._emb_aug(spark, SF_DIR).cache()


def _duck_emb_aug_sql(sql_fn, **kw):
    import __spark_entry__ as se

    return sql_fn(table=se._EMB_AUG_SQL, **kw)


def test_embedding_dup_pairs_oracle(emb_aug, duck):
    assert_match(
        dd.embedding_dup_pairs(emb_aug, threshold=0.99),
        duck,
        _duck_emb_aug_sql(dd.embedding_dup_pairs_sql, threshold=0.99),
    )


def test_embedding_dup_recall_and_precision(emb_aug, duck):
    """Every planted near-dup pair is found; every output pair is a true
    >=threshold pair (LSH candidates are exact-cosine verified)."""
    got = dd.embedding_dup_pairs(emb_aug, threshold=0.99).toPandas()
    got_pairs = set(zip(got["id_a"].astype(int), got["id_b"].astype(int)))
    import __spark_entry__ as se

    brute = duck.sql(
        f"""
        WITH base AS (SELECT vec_id, embedding AS v FROM {se._EMB_AUG_SQL})
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM base a JOIN base b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.99
        """
    ).df()
    brute_pairs = set(zip(brute["id_a"].astype(int), brute["id_b"].astype(int)))
    planted = {(v, v + 100000) for v in range(0, 500, 50)} | {
        (v, v + 200000) for v in range(25, 500, 50)
    }
    assert planted <= brute_pairs  # the plant actually produces >=0.99 pairs
    assert got_pairs <= brute_pairs  # precision 1.0 (exact verify)
    assert planted <= got_pairs  # LSH recall 1.0 on the planted dups
    # scores: scaled copies are cosine 1.0 after rounding
    scaled = got[got["id_b"] < 200000]
    assert (scaled["cos"] == 1.0).all()


def test_embedding_dup_skew_guard(spark):
    """Buckets larger than max_bucket are dropped (degenerate-dup guard) —
    identical vectors all land in one bucket per band and produce nothing."""
    n = 50
    rows = [(i, [1.0] * dd.EMB_DIM) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    out = dd.embedding_dup_pairs(df, threshold=0.5, max_bucket=10)
    assert out.count() == 0
    # sanity: with the guard above the bucket size, pairs appear
    out2 = dd.embedding_dup_pairs(df, threshold=0.5, max_bucket=n * 2)
    assert out2.count() == n * (n - 1) // 2
