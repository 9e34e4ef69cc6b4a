"""sparksearch — a PySpark-native inverted-index build + BM25 query engine.

A from-scratch, Spark-first re-implementation of the *capabilities* of the
reference WikiSearch pipeline (gperdrizet/OpenSearch): text extraction /
cleaning, tokenization, inverted-index construction (delta+varint packed
posting blocks with per-block max-score metadata), BM25 top-k retrieval,
checkpoint/resume via segment manifests — plus the training-data-pipeline
operators a 100 TB corpus needs (dedup, similarity search, text analysis).

Design notes (scale-first):

* All heavy work is declarative DataFrame lineage; Catalyst handles
  pushdown/pruning/AQE.  Python appears only inside Arrow-vectorized
  kernels — pandas UDFs (extraction), ``mapInArrow`` (posting pack,
  zero-copy binary columns), ``applyInPandas`` (DAAT scoring) — zero
  per-row Python UDFs anywhere.
* Doc IDs are content-derived (``xxhash64(url)``) so every artifact is
  deterministic under any parallelism (reference quirk 4 in SURVEY §2.8
  is deliberately NOT reproduced).
* Head-term skew is defused by *range-bucketing doc_ids into segments*:
  a hot term's postings split evenly across segments (uniform hash IDs),
  each segment covers a disjoint doc_id range, so per-term block streams
  are globally sorted by construction — salted repartitioning that needs
  no re-sorting merge phase.
"""

__version__ = "0.1.0"
