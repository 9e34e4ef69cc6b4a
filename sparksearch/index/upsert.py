"""Incremental index upsert — last-write-wins by doc_id (reference Q6).

Capability twin of the reference's ``doc_as_upsert`` bulk action
(``keyword_search/functions/parsing_functions.py:137``): re-submitting a
document replaces its previous version in the index.  The reference
delegates the merge to OpenSearch/Lucene (delete + re-add + segment
merge); here the merge is three declarative steps over the index's own
tables:

1. tokenize ONLY the delta docs (the expensive extract/tokenize work is
   O(delta), never O(corpus) — in the reference pipeline extraction is
   the dominant cost: ~17 h single-core vs minutes of indexing,
   ``notebooks/01`` conclusion);
2. merge the flat tf table: ``old tfrows ANTI JOIN delta ids`` ∪
   ``delta tfrows`` (one column-pruned scan of tfrows; the anti join
   broadcasts the delta id set), then recompute stats/doclens from the
   merged rows;
3. repack ONLY the term buckets whose postings changed — the buckets of
   terms appearing in either the docs' OLD rows or their NEW rows; all
   other posting files are untouched bytes.

Because posting blocks carry avgdl-independent metadata
(``pack.py``: max_tf/min_dl), a corpus-statistics shift from the upsert
never invalidates untouched blocks — queries apply the new avgdl at
score time.  The result is bit-identical to a full rebuild over the
merged corpus (``tests/test_upsert.py``).

Scale notes: this is the right shape for batch upserts (hours-cadence
refresh of a web corpus) where the delta's vocabulary touches most
buckets anyway.  For high-frequency small deltas a Lucene-style
generational design (delta segments + tombstones + background compact)
amortizes better; the layout here supports adding that later without a
format change (a generation column in the postings path).

Deltas must carry at most one row per doc_id; apply successive
versions of the same doc as successive upserts (the reference's bulk
semantics are likewise per-batch last-write-wins).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from sparksearch.index import manifest as mf
from sparksearch.index.build import pack_unit, tfrows_table


def upsert_index(
    spark: SparkSession,
    delta_docs: DataFrame,
    index_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Upsert ``delta_docs`` into the index at ``index_dir``; returns the
    updated meta dict.  New doc_ids are inserted, existing ones replaced.
    """
    meta = mf.read_meta(index_dir)
    n_segments = meta["n_segments"]
    n_buckets = meta["n_buckets"]
    n_units = meta["n_units"]

    tfrows_path = os.path.join(index_dir, "tfrows")
    tfrows_new = os.path.join(index_dir, "tfrows_new")
    tfrows_delta = os.path.join(index_dir, "tfrows_delta")
    stats_path = os.path.join(index_dir, "stats")
    doclens_path = os.path.join(index_dir, "doclens")
    doclens_new = os.path.join(index_dir, "doclens_new")

    # ---- 1. tokenize the delta only --------------------------------------
    delta_obs = Observation("delta_corpus")
    dtf = tfrows_table(
        delta_docs, id_col, text_col, delta_obs, n_segments, n_buckets, n_units
    )
    dtf.write.mode("overwrite").partitionBy("unit", "term_bucket").parquet(tfrows_delta)
    try:
        n_delta = int(delta_obs.get["n_docs"] or 0)
        delta_tokens = int(delta_obs.get["total_tokens"] or 0)
    except Exception:
        # a provably-empty delta plan (e.g. limit(0)) collapses to a
        # LocalRelation and the observe node never executes
        n_delta = delta_docs.filter(F.col(text_col).isNotNull()).count()
        delta_tokens = 0
        if n_delta:
            row = spark.read.parquet(tfrows_delta).agg(
                F.coalesce(F.sum("tf"), F.lit(0)).alias("t")
            ).collect()[0]
            delta_tokens = int(row["t"])
    if n_delta == 0:
        shutil.rmtree(tfrows_delta, ignore_errors=True)
        return meta

    delta_on_disk = spark.read.parquet(tfrows_delta)
    delta_ids = (
        delta_docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"))
        .distinct()
    )

    # ---- 2. counters from the docs being replaced ------------------------
    doclens_old = spark.read.parquet(doclens_path)
    removed = (
        doclens_old.join(F.broadcast(delta_ids), "doc_id", "semi")
        .agg(F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("t"))
        .collect()[0]
    )
    n_removed, removed_tokens = int(removed["n"]), int(removed["t"])

    # ---- 3. affected term buckets: old rows of delta docs ∪ delta rows ---
    old = spark.read.parquet(tfrows_path)
    affected = (
        old.join(F.broadcast(delta_ids), "doc_id", "semi")
        .select("unit", "term_bucket")
        .unionByName(delta_on_disk.select("unit", "term_bucket"))
        .distinct()
        .collect()
    )
    by_unit: dict[int, list[int]] = {}
    for r in affected:
        by_unit.setdefault(int(r["unit"]), []).append(int(r["term_bucket"]))

    # ---- 4. merged tfrows (write-new + swap: no self-overwrite) ----------
    merged = old.join(F.broadcast(delta_ids), "doc_id", "anti").unionByName(
        delta_on_disk
    )
    merged.write.mode("overwrite").partitionBy("unit", "term_bucket").parquet(tfrows_new)
    shutil.rmtree(tfrows_path)
    os.replace(tfrows_new, tfrows_path)

    # ---- 5. stats + doclens from the merged rows -------------------------
    tfrows_on_disk = spark.read.parquet(tfrows_path)
    stats = tfrows_on_disk.groupBy("term_id", "term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )
    stats.write.mode("overwrite").parquet(stats_path)

    delta_seen = delta_on_disk.groupBy("doc_id").agg(
        F.first("dl").cast("long").alias("dl")
    )
    delta_zero = delta_ids.join(delta_seen.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id", F.lit(0).cast("long").alias("dl")
    )
    doclens_merged = (
        doclens_old.join(F.broadcast(delta_ids), "doc_id", "anti")
        .unionByName(delta_seen.select("doc_id", "dl"))
        .unionByName(delta_zero)
    )
    doclens_merged.write.mode("overwrite").parquet(doclens_new)
    shutil.rmtree(doclens_path)
    os.replace(doclens_new, doclens_path)

    # ---- 6. meta (exact integer arithmetic → identical to a rebuild) -----
    meta["n_docs"] = meta["n_docs"] - n_removed + n_delta
    meta["total_tokens"] = meta["total_tokens"] - removed_tokens + delta_tokens
    meta["avgdl"] = (meta["total_tokens"] / meta["n_docs"]) if meta["n_docs"] else 0.0
    mf.write_meta(index_dir, meta)
    mf.write_entry(index_dir, "stage_tfrows", {"n_docs": meta["n_docs"]})

    # ---- 7. repack only the affected buckets -----------------------------
    for unit, buckets in sorted(by_unit.items()):
        pack_unit(spark, index_dir, unit, meta, buckets=sorted(buckets))
    shutil.rmtree(tfrows_delta, ignore_errors=True)
    return meta
