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
2. merge ONLY the affected partitions: tfrows is hive-partitioned by
   (unit, term_bucket), so ``old(affected) ANTI JOIN delta ids ∪ delta``
   stages just those buckets and swaps them in; stats (partitioned by
   term_bucket) merge INCREMENTALLY — df/cf are integers, so
   ``old − removed + added`` is exactly the recomputed value and terms
   reaching df = 0 drop out;
3. repack ONLY the affected term buckets; every unaffected tfrows,
   stats, and postings partition is untouched bytes.

Total cost: O(delta tokenize) + O(affected-bucket rows) + one
column-pruned discovery scan of tfrows (doc_id + partition columns) to
locate the replaced docs' old buckets + an O(n_docs) doclens rewrite
(16 B/doc; partition it by doc range if that ever dominates).

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

Crash-safety: all staged outputs are written BEFORE any live partition
is touched, and each partition swap is an atomic directory rename.  A
crash before the swap phase is fully recoverable by re-running the same
upsert (stages rebuild from the untouched live tables).  A crash inside
the swap phase leaves the staged dirs in place (they are only removed
on success): finish by re-applying the remaining renames, or restore
the affected buckets from the staged state.  Driving upserts through
``streaming.stream_index_ingest`` adds checkpointed batch boundaries on
top (a replayed batch re-runs against the already-upserted state and
converges — replacing docs with identical content is a no-op).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from sparksearch.index import manifest as mf
from sparksearch.index.build import _run_pack_tasks, tfrows_table


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
    # one column-pruned scan of tfrows (doc_id + the two partition
    # columns) finds every bucket holding a replaced doc's old postings
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
    affected_buckets = sorted({int(r["term_bucket"]) for r in affected})
    affected_pairs = {(int(r["unit"]), int(r["term_bucket"])) for r in affected}

    # ---- 4+5. stage the merged AFFECTED partitions of tfrows and the
    # incrementally-merged stats buckets (reads of the OLD tables happen
    # here, before any swap).  Everything is O(affected), not O(corpus):
    # unaffected tfrows/stats/postings partitions are untouched bytes.
    old_affected = old.filter(F.col("term_bucket").isin(affected_buckets))
    merged = old_affected.join(F.broadcast(delta_ids), "doc_id", "anti").unionByName(
        delta_on_disk
    )
    tfrows_stage = os.path.join(index_dir, "tfrows_stage")

    def write_tfrows_stage():
        merged.write.mode("overwrite").partitionBy("unit", "term_bucket").parquet(
            tfrows_stage
        )

    # incremental stats: df/cf are integers, so old − removed + added is
    # EXACTLY the recomputed value; terms whose df reaches 0 drop out
    rem = (
        old_affected.join(F.broadcast(delta_ids), "doc_id", "semi")
        .groupBy("term_id", "term")
        .agg(F.count(F.lit(1)).alias("df_r"), F.sum("tf").alias("cf_r"))
    )
    add = delta_on_disk.groupBy("term_id", "term").agg(
        F.count(F.lit(1)).alias("df_a"), F.sum("tf").alias("cf_a")
    )
    old_stats = (
        spark.read.parquet(stats_path)
        .filter(F.col("term_bucket").isin(affected_buckets))
        .select("term_id", "term", "df", "cf")
    )
    stats_new = (
        old_stats.join(rem, ["term_id", "term"], "full_outer")
        .join(add, ["term_id", "term"], "full_outer")
        .select(
            "term_id",
            "term",
            (
                F.coalesce("df", F.lit(0))
                - F.coalesce("df_r", F.lit(0))
                + F.coalesce("df_a", F.lit(0))
            ).alias("df"),
            (
                F.coalesce("cf", F.lit(0))
                - F.coalesce("cf_r", F.lit(0))
                + F.coalesce("cf_a", F.lit(0))
            ).alias("cf"),
        )
        .filter(F.col("df") > 0)
        .withColumn("term_bucket", F.pmod(F.col("term_id"), F.lit(n_buckets)))
    )
    stats_stage = os.path.join(index_dir, "stats_stage")

    def write_stats_stage():
        stats_new.write.mode("overwrite").partitionBy("term_bucket").parquet(stats_stage)

    def write_doclens_stage():
        delta_seen = delta_on_disk.groupBy("doc_id").agg(
            F.first("dl").cast("long").alias("dl")
        )
        delta_zero = delta_ids.join(
            delta_seen.select("doc_id"), "doc_id", "left_anti"
        ).select("doc_id", F.lit(0).cast("long").alias("dl"))
        (
            doclens_old.join(F.broadcast(delta_ids), "doc_id", "anti")
            .unionByName(delta_seen.select("doc_id", "dl"))
            .unionByName(delta_zero)
            .write.mode("overwrite").parquet(doclens_new)
        )

    # the three staged writes read only the OLD tables and are mutually
    # independent — run them concurrently (amortizes each job's floor)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        for f in [
            pool.submit(write_tfrows_stage),
            pool.submit(write_stats_stage),
            pool.submit(write_doclens_stage),
        ]:
            f.result()

    # ---- swap: staged partitions replace the live ones ------------------
    # (writes above all read the OLD tables, so swapping must come last;
    # a bucket with NO staged rows — every posting of its terms belonged
    # to replaced docs — is simply deleted)
    shutil.rmtree(doclens_path)
    os.replace(doclens_new, doclens_path)
    for unit, bkt in sorted(affected_pairs):
        dst = os.path.join(tfrows_path, f"unit={unit}", f"term_bucket={bkt}")
        src = os.path.join(tfrows_stage, f"unit={unit}", f"term_bucket={bkt}")
        shutil.rmtree(dst, ignore_errors=True)
        if os.path.isdir(src):
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(src, dst)
    shutil.rmtree(tfrows_stage, ignore_errors=True)
    for bkt in affected_buckets:
        dst = os.path.join(stats_path, f"term_bucket={bkt}")
        src = os.path.join(stats_stage, f"term_bucket={bkt}")
        shutil.rmtree(dst, ignore_errors=True)
        if os.path.isdir(src):
            os.replace(src, dst)
    shutil.rmtree(stats_stage, ignore_errors=True)

    # ---- 6. meta (exact integer arithmetic → identical to a rebuild) -----
    meta["n_docs"] = meta["n_docs"] - n_removed + n_delta
    meta["total_tokens"] = meta["total_tokens"] - removed_tokens + delta_tokens
    meta["avgdl"] = (meta["total_tokens"] / meta["n_docs"]) if meta["n_docs"] else 0.0
    mf.write_meta(index_dir, meta)
    mf.write_entry(index_dir, "stage_tfrows", {"n_docs": meta["n_docs"]})

    # ---- 7. repack only the affected buckets (ONE job, a task each) ------
    pairs = sorted((u, b) for u, bkts in by_unit.items() for b in bkts)
    _run_pack_tasks(spark, index_dir, pairs)
    shutil.rmtree(tfrows_delta, ignore_errors=True)
    return meta
