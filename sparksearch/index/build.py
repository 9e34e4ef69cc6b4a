"""Inverted-index construction — the engine's core batch pipeline.

Capability twin of the reference's ingest path (stream → parse → bulk
upsert into OpenSearch, ``keyword_search/process_dump.py:25-96``), but
expressed as one declarative DataFrame lineage whose only Python is the
Arrow-batched pack kernel:

    documents
      → tokens (JVM: lower/split/array_remove — whole-stage codegen)
      → explode → groupBy(doc_id, term) tf          [partial agg map-side]
      → term_id = xxhash64(term), segment = doc_id range bucket
      → repartition(term_id, segment_id) → sortWithinPartitions
      → mapInArrow(pack)                             [numpy varint blocks]
      → parquet partitioned by term_bucket           [query-time pruning]

Scale design
============
* **Deterministic ids.**  ``doc_id`` is caller-provided and content
  derived (``xxhash64(url)`` for the canonical table); ``term_id =
  xxhash64(term)``.  Nothing depends on partition/arrival order, so the
  index bits are identical at local[8] and local[32] (reference quirk 4
  avoided).
* **Skew.**  Segments are *range buckets of the doc_id space*
  (``doc_id >> (64 - log2 n_segments)``, sign-corrected).  Hash ids are
  uniform, so a head term's postings split evenly over all segments —
  this IS the salted repartitioning of the north rule, with the salt
  chosen so per-term segment streams are globally doc-ordered by
  construction (disjoint ranges ⇒ no re-sort merge phase).  The pack
  shuffle key is (term_id, segment_id), so no reducer sees more than one
  segment's slice of a hot term.
* **Shuffles.** Exactly two wide exchanges: the tf aggregation (with
  map-side partial agg collapsing per-token rows first) and the pack
  repartition.  The stats aggregation reuses the tfrows parquet.
* **Resume.**  Stage A (tfrows/stats/meta) then stage B packs in
  ``n_units`` independent jobs (unit = term_bucket group), each
  committing a manifest entry; ``resume=True`` skips completed units.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from sparksearch.analyze import tokens_col
from sparksearch.index import manifest as mf
from sparksearch.index.pack import PACK_SCHEMA, make_pack_fn

FORMAT_VERSION = 1


def segment_col(doc_id_col, n_segments: int):
    """Range-bucket a signed int64 id into [0, n_segments); monotone in doc_id."""
    shift = 64 - int(math.log2(n_segments))
    return (F.shiftright(doc_id_col, shift) + F.lit(n_segments // 2)).cast("int")


def segment_of(doc_id: int, n_segments: int) -> int:
    shift = 64 - int(math.log2(n_segments))
    return (doc_id >> shift) + n_segments // 2


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    n_segments: int = 8,
    n_buckets: int = 16,
    n_units: int = 4,
    resume: bool = False,
    overwrite: bool = True,
    pack_batch_rows: int = 65536,
    _fail_after_unit: int | None = None,
) -> dict:
    """Build a BM25 inverted index under ``index_dir``; returns meta dict.

    ``docs`` must carry a unique int64 ``id_col`` and a string
    ``text_col`` (already extracted/cleaned — see ``sparksearch.extract``).
    ``_fail_after_unit`` is a test hook for the kill/resume test.
    """
    if n_segments & (n_segments - 1):
        raise ValueError("n_segments must be a power of two")
    if n_buckets % n_units:
        raise ValueError("n_buckets must be a multiple of n_units")
    if not resume and overwrite and os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    os.makedirs(index_dir, exist_ok=True)

    tfrows_path = os.path.join(index_dir, "tfrows")
    stats_path = os.path.join(index_dir, "stats")
    postings_path = os.path.join(index_dir, "postings")

    # ---- stage A: tf rows + doc lengths + term stats + global stats ----
    # ONE tokenize pass over the corpus: everything downstream (doclens,
    # stats, meta) derives from the tfrows parquet's columnar subsets.
    # Zero-token docs never reach tfrows, so n_docs comes from a cheap
    # no-tokenize count and avgdl = sum(dl)/n_docs (they contribute dl=0,
    # matching the exhaustive-BM25 oracle's corpus statistics).
    if not (resume and mf.read_entry(index_dir, "stage_tfrows")):
        base = (
            docs.filter(F.col(text_col).isNotNull())
            .select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("toks"))
        )
        flat = base.select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
        )
        tf = flat.groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
        tfrows = tf.select(
            F.xxhash64("term").alias("term_id"),
            F.col("term"),
            segment_col(F.col("doc_id"), n_segments).alias("segment_id"),
            "doc_id",
            "tf",
            "dl",
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("term_bucket"),
            (F.pmod(F.xxhash64("term"), F.lit(n_buckets)) % n_units).alias("unit"),
        )
        # total_tokens = Σ tf over all (doc, term) rows == Σ dl over docs;
        # it rides the tfrows write via df.observe — no doclens job at all
        # (per-doc lengths live packed inside the posting blocks)
        tf_obs = Observation("tfrows")
        tfrows = tfrows.observe(tf_obs, F.sum("tf").alias("total_tokens"))
        tfrows.write.mode("overwrite").partitionBy("unit").parquet(tfrows_path)

        n_docs = docs.filter(F.col(text_col).isNotNull()).count()
        tfrows_on_disk = spark.read.parquet(tfrows_path)
        stats = tfrows_on_disk.groupBy("term_id", "term").agg(
            F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
        )
        stats.write.mode("overwrite").parquet(stats_path)

        total_tokens = int(tf_obs.get["total_tokens"] or 0)
        meta = {
            "version": FORMAT_VERSION,
            "n_docs": n_docs,
            "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
            "total_tokens": total_tokens,
            "k1": k1,
            "b": b,
            "n_segments": n_segments,
            "n_buckets": n_buckets,
            "n_units": n_units,
        }
        mf.write_meta(index_dir, meta)
        mf.write_entry(index_dir, "stage_tfrows", {"n_docs": meta["n_docs"]})
    else:
        meta = mf.read_meta(index_dir)

    # ---- stage B: pack posting blocks, one resumable job per unit ----
    done = mf.completed_units(index_dir) if resume else set()
    pack_fn = make_pack_fn(meta["k1"], meta["b"], meta["avgdl"])
    prev_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(pack_batch_rows))
    try:
        for unit in range(n_units):
            if unit in done:
                continue
            # a previous attempt may have died mid-append: clear this
            # unit's bucket dirs so the re-run is idempotent
            for bucket in range(unit, n_buckets, n_units):
                bdir = os.path.join(postings_path, f"term_bucket={bucket}")
                if os.path.isdir(bdir):
                    shutil.rmtree(bdir)
            unit_rows = spark.read.parquet(
                os.path.join(tfrows_path, f"unit={unit}")
            ).select("term_id", "segment_id", "doc_id", "tf", "dl")
            # ^ term strings stay out of the pack shuffle (stats carries them)
            packed = (
                unit_rows.repartition("term_id", "segment_id")
                .sortWithinPartitions("term_id", "segment_id", "doc_id")
                .mapInArrow(pack_fn, PACK_SCHEMA)
                .withColumn("term_bucket", F.pmod(F.col("term_id"), F.lit(n_buckets)))
            )
            # block counter rides the write itself (df.observe) — no
            # re-read job per unit
            obs = Observation(f"pack_unit_{unit}")
            packed = packed.observe(obs, F.count(F.lit(1)).alias("n_blocks"))
            packed.write.mode("append").partitionBy("term_bucket").parquet(postings_path)
            n_blocks = int(obs.get["n_blocks"])
            mf.write_entry(index_dir, f"unit_{unit}", {"unit": unit, "n_blocks": n_blocks})
            if _fail_after_unit is not None and unit >= _fail_after_unit:
                raise RuntimeError(f"injected failure after unit {unit}")
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev_batch)
    return meta
