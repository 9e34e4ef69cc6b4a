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
  Corpus counters (n_docs, total_tokens) ride the tokenize pass via
  ``df.observe`` — no second scan of the corpus.
* **Resume.**  Stage A (tfrows/stats/doclens/meta) then stage B packs
  ``n_units`` independent jobs (unit = term_bucket group, each writing
  its own ``postings/unit=<u>/`` root so jobs never share an output
  committer), each committing a manifest entry; ``resume=True`` skips
  completed units.  Units run CONCURRENTLY (thread pool sharing the
  SparkContext) — serial unit jobs each leave cores idle in their tail
  stages, which is what capped scaling efficiency in round 1.
"""

from __future__ import annotations

import math
import os
import shutil
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from sparksearch.analyze import tokens_col
from sparksearch.index import manifest as mf
from sparksearch.index.pack import PACK_SCHEMA, make_pack_fn

FORMAT_VERSION = 2


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
    unit_parallelism: int | None = None,
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
    doclens_path = os.path.join(index_dir, "doclens")
    postings_path = os.path.join(index_dir, "postings")

    # ---- stage A: tf rows + doc lengths + term stats + global stats ----
    # ONE tokenize pass over the corpus: n_docs and total_tokens ride the
    # tfrows write via df.observe on the pre-explode node, and stats/
    # doclens derive from the tfrows parquet's columnar subsets.  The only
    # other corpus touch is an id-column-only scan for zero-token docs
    # (explode drops them from tfrows but they count toward n_docs/avgdl
    # and must survive in doclens for upsert bookkeeping).
    if not (resume and mf.read_entry(index_dir, "stage_tfrows")):
        corpus_obs = Observation("corpus")
        base = (
            docs.filter(F.col(text_col).isNotNull())
            .select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("toks"))
            .observe(
                corpus_obs,
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.size("toks")).alias("total_tokens"),
            )
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
        tfrows.write.mode("overwrite").partitionBy("unit").parquet(tfrows_path)
        n_docs = int(corpus_obs.get["n_docs"] or 0)
        total_tokens = int(corpus_obs.get["total_tokens"] or 0)

        tfrows_on_disk = spark.read.parquet(tfrows_path)
        stats = tfrows_on_disk.groupBy("term_id", "term").agg(
            F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
        )
        stats.write.mode("overwrite").parquet(stats_path)

        # doclens sidecar (doc_id, dl): zero-token docs re-found with a
        # column-pruned id-only corpus scan + anti-join (no re-tokenize)
        seen = tfrows_on_disk.groupBy("doc_id").agg(F.first("dl").alias("dl"))
        all_ids = docs.filter(F.col(text_col).isNotNull()).select(
            F.col(id_col).alias("doc_id")
        )
        zero = all_ids.join(seen.select("doc_id"), "doc_id", "left_anti").select(
            "doc_id", F.lit(0).alias("dl")
        )
        seen.select("doc_id", "dl").unionByName(zero).withColumn(
            "dl", F.col("dl").cast("long")
        ).write.mode("overwrite").parquet(doclens_path)

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
    pending = [u for u in range(n_units) if u not in done]
    prev_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(pack_batch_rows))
    try:
        if _fail_after_unit is not None:
            # test hook needs deterministic ordering → sequential
            for unit in pending:
                pack_unit(spark, index_dir, unit, meta)
                if unit >= _fail_after_unit:
                    raise RuntimeError(f"injected failure after unit {unit}")
        else:
            workers = min(unit_parallelism or n_units, max(1, len(pending)))
            if workers <= 1:
                for unit in pending:
                    pack_unit(spark, index_dir, unit, meta)
            else:
                # independent jobs over disjoint inputs/outputs; threads
                # share the SparkContext so the scheduler interleaves
                # their stages and no unit's tail leaves cores idle
                with ThreadPoolExecutor(max_workers=workers) as pool:
                    futs = [
                        pool.submit(pack_unit, spark, index_dir, unit, meta)
                        for unit in pending
                    ]
                    for f in futs:
                        f.result()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev_batch)
    return meta


def pack_unit(
    spark: SparkSession,
    index_dir: str,
    unit: int,
    meta: dict,
    buckets: list[int] | None = None,
) -> int:
    """Pack one unit's term buckets into ``postings/unit=<u>/``.

    Idempotent: clears the unit's output root (or, with ``buckets``,
    just those bucket dirs) before writing, then commits a manifest
    entry.  ``buckets`` restricts the repack to a subset of the unit's
    term buckets (used by upsert merges).
    """
    n_buckets = meta["n_buckets"]
    tfrows_unit = os.path.join(index_dir, "tfrows", f"unit={unit}")
    out_dir = os.path.join(index_dir, "postings", f"unit={unit}")
    if buckets is None:
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
    else:
        for bkt in buckets:
            bdir = os.path.join(out_dir, f"term_bucket={bkt}")
            if os.path.isdir(bdir):
                shutil.rmtree(bdir)
    if not os.path.isdir(tfrows_unit):
        if buckets is None:
            mf.write_entry(index_dir, f"unit_{unit}", {"unit": unit, "n_blocks": 0})
        return 0
    unit_rows = spark.read.parquet(tfrows_unit).select(
        "term_id", "segment_id", "doc_id", "tf", "dl"
    )
    # ^ term strings stay out of the pack shuffle (stats carries them)
    if buckets is not None:
        unit_rows = unit_rows.filter(
            F.pmod(F.col("term_id"), F.lit(n_buckets)).isin(buckets)
        )
    pack_fn = make_pack_fn()
    packed = (
        unit_rows.repartition("term_id", "segment_id")
        .sortWithinPartitions("term_id", "segment_id", "doc_id")
        .mapInArrow(pack_fn, PACK_SCHEMA)
        .withColumn("term_bucket", F.pmod(F.col("term_id"), F.lit(n_buckets)))
    )
    # block counter rides the write itself (df.observe) — no re-read job
    obs = Observation(f"pack_unit_{unit}_{os.getpid()}_{id(packed)}")
    packed = packed.observe(obs, F.count(F.lit(1)).alias("n_blocks"))
    packed.write.mode("append").partitionBy("term_bucket").parquet(out_dir)
    n_blocks = int(obs.get["n_blocks"])
    if buckets is None:  # full-unit build: commit the resume marker
        mf.write_entry(index_dir, f"unit_{unit}", {"unit": unit, "n_blocks": n_blocks})
    return n_blocks
