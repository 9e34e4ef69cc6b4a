"""Physical-plan audit → PLANS.md.

Captures ``explain("formatted")`` for the engine's headline operations
and extracts the load-bearing properties (partition pruning, parquet
filter pushdown, exchange count, broadcast usage, whole-stage codegen,
Python-kernel placement) so plan regressions are visible in review.

Usage: python tools/plan_audit.py [sf_dir]   (writes PLANS.md)
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY = re.compile(
    r"PartitionFilters: \[[^\]]*\]|PushedFilters: \[[^\]]*\]|ReadSchema: [^\n]*"
)


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(df) -> dict:
    p = plan_text(df)
    return {
        "shuffles": len(re.findall(r"\(\d+\) Exchange", p))
        - p.count("Exchange SinglePartition"),  # top-k merges excluded below
        "single_part": p.count("Exchange SinglePartition"),
        "broadcasts": len(re.findall(r"\(\d+\) BroadcastExchange", p)),
        # formatted mode tags codegen'd operators with "[codegen id : N]"
        "codegen": "codegen id" in p,
        "python": sorted(
            set(re.findall(r"(FlatMapGroupsInPandas|ArrowEvalPython|MapInPandas|MapInArrow|BatchEvalPython)", p))
        ),
        "take_ordered": "TakeOrderedAndProject" in p,
        "pushed": KEY.findall(p)[:4],
    }


def fmt(name: str, note: str, a: dict) -> str:
    pushed = "\n".join(f"      {s[:110]}" for s in a["pushed"])
    py = ", ".join(a["python"]) or "none"
    return (
        f"### {name}\n\n{note}\n\n"
        f"- shuffle exchanges: **{a['shuffles']}** (+{a['single_part']} single-partition top-k merge)"
        f" · broadcasts: **{a['broadcasts']}** · TakeOrderedAndProject: **{a['take_ordered']}**\n"
        f"- whole-stage codegen: **{a['codegen']}** · Python kernels: **{py}**\n"
        f"- scan properties:\n{pushed or '      (no parquet scan)'}\n"
    )


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import functions as F

    from sparksearch import streaming as st
    from sparksearch.ops import dedup as dd
    from sparksearch.ops import similarity as sim
    from sparksearch.ops import textstats as ts
    from sparksearch.pipeline import build_and_load
    from sparksearch.query.bm25 import bm25_topk_df
    from sparksearch.query.topk import InvertedIndex
    from sparksearch.session import get_spark

    from sparksearch.index.lexicon import build_lexicon
    from sparksearch.query import aggs as ag
    from sparksearch.query import boolq as bq
    from sparksearch.query import highlight as hl
    from sparksearch.query import phrase as ph
    from sparksearch.query import rank as rk
    from sparksearch.query import sigterms as sg
    from sparksearch.query import sortpage as sp

    spark = get_spark("plan-audit", cores=8)
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    events = spark.read.parquet(os.path.join(sf, "events.parquet"))
    index_dir = os.path.join(tempfile.gettempdir(), "sparksearch_plan_idx")
    build_and_load(spark, docs.select("doc_id", "text"), index_dir)
    dist = InvertedIndex(spark, index_dir, driver_path_max_postings=0)
    build_lexicon(spark, docs, index_dir)  # sigterms sidecar
    from sparksearch.index.positions import (
        build_positions,
        match_phrase_positional,
    )

    build_positions(spark, docs.select("doc_id", "text"), index_dir)

    vidx_dir = os.path.join(tempfile.gettempdir(), "sparksearch_plan_vidx")
    sim.build_vector_index(spark, emb, vidx_dir, kind="ivf")  # probe-plan audit
    vidx = sim.VectorIndex(spark, vidx_dir)
    qv = emb.filter("vec_id = 0").select(
        F.col("embedding").cast("array<double>")
    ).collect()[0][0]

    sections = [
        (
            "Packed BM25 search — distributed path",
            "Pruned scan (directory-level `term_bucket` pruning + `term_id IN` "
            "row-group pushdown) → ONE exchange into per-segment scoring "
            "(`FlatMapGroupsInPandas` = the MaxScore/block-max kernel) → "
            "`TakeOrderedAndProject` coordinator merge.  The common small-query "
            "path never reaches Spark at all (direct pyarrow read, `search_local`).",
            audit(dist.search("batch scan", k=10)),
        ),
        (
            "Exhaustive BM25 (no index)",
            "All statistics joins are broadcasts; the global top-k is "
            "TakeOrderedAndProject (never a single-partition window).",
            audit(bm25_topk_df(docs, "batch scan", 10)),
        ),
        (
            "Batched multi-query (search_many, distributed)",
            "One pruned scan for the UNION of all query term ids; every query "
            "scored per segment in one kernel pass; per-query top-k on the tiny "
            "candidate set.",
            audit(dist.search_many(["batch scan", "data window"], k=10)),
        ),
        (
            "MinHash+LSH near-dup",
            "Shingle frame persisted once; degenerate buckets dropped via a "
            "broadcast anti-join BEFORE the band self-join (skew guard).",
            audit(dd.minhash_lsh_pairs(docs, threshold=0.5, _materialize=False)),
        ),
        (
            "Text quality scores",
            "Pure JVM expressions — fully whole-stage-codegen'd, zero Python.",
            audit(ts.quality_scores(docs)),
        ),
        (
            "Streaming windowed aggregation (batch twin)",
            "Tumbling window + partial aggregation; identical lineage runs under "
            "Structured Streaming with a watermark.",
            audit(st.windowed_event_stats(events)),
        ),
        (
            "Persisted IVF vector index probe",
            "Centroid argmin on the driver; the vector scan is pruned to the "
            "probed `cell=<id>/` directories.",
            audit(vidx.topk(qv, 10, nprobe=2, exclude_vec_id=0)),
        ),
        (
            "match_phrase (indexed, positional verification)",
            "Candidates = posting-list conjunction of the phrase terms (pruned "
            "scan); adjacency verified by a pure-Catalyst position filter on "
            "the leftsemi-joined candidates only; the verified frame is "
            "persisted so the df aggregate and the scoring read it once.",
            audit(ph.match_phrase_indexed(dist, docs, "table hash", 10)),
        ),
        (
            "match_phrase (positional sidecar, index-resident)",
            "One bucket-pruned `positions/` scan per phrase term "
            "(`term_bucket` PartitionFilters + `term_id` row-group "
            "pushdown) inner-joined on doc_id; adjacency counted by "
            "`array_intersect` of shifted position arrays — document "
            "text is never read (no corpus scan in the plan).",
            audit(match_phrase_positional(dist, "table hash", 10)),
        ),
        (
            "bool compound query (engine path)",
            "Per-clause FULL match sets from pruned postings (exhaustive "
            "kernel / id-set decode), combined by one groupBy — the corpus "
            "table is never read.",
            audit(
                bq.bool_search(
                    dist, must=["batch scan"], should=["data"],
                    must_not=["vector"], k=10,
                )
            ),
        ),
        (
            "terms facet over the indexed match set",
            "Match ids from pruned postings decode; facet = one partial-agg "
            "groupBy after a semi-join AQE can broadcast.",
            audit(ag.terms_agg_indexed(dist, docs, "batch scan", "source", 10)),
        ),
        (
            "search_after page (cursor pagination)",
            "The strictly-after cursor predicate is plain column comparisons — "
            "pushed into the parquet scan (PushedFilters below) — feeding "
            "TakeOrderedAndProject; no global sort, no offset skip.",
            audit(
                sp.sorted_hits(
                    docs, "batch scan", [("n_chars", "desc")], 10,
                    search_after=(250, 42),
                )
            ),
        ),
        (
            "highlight (snippets for the k winners only)",
            "BM25 top-k broadcast back onto the corpus as a k-row join; the "
            "snippet expression is whole-stage-codegen array ops computed for "
            "k rows regardless of corpus size.",
            audit(hl.highlight_topk(docs, "batch scan", 10)),
        ),
        (
            "significant_text (index sidecars)",
            "Foreground df = tfrows ⋈ pruned-postings match ids; background "
            "df = stats sidecar; strings = lexicon.  Corpus text never read.",
            audit(sg.significant_text_indexed(dist, "dup", 10)),
        ),
        (
            "collapse (one hit per field value)",
            "Full scored match set → per-group row_number window (ONE "
            "hash-partition shuffle on the collapse key, no global sort) → "
            "TakeOrderedAndProject.",
            audit(rk.collapse_topk(docs, "batch scan", "source", 10)),
        ),
        (
            "function_score (field_value_factor)",
            "Shared bm25_scores_df front × a 2-column field projection join; "
            "the boost is a codegen'd expression, top-k stays "
            "TakeOrderedAndProject.",
            audit(rk.function_score_topk(docs, "batch scan", "n_chars", 10)),
        ),
        (
            "Percolate — packed path",
            "Stored queries broadcast against the pruned-postings pairs "
            "kernel: scan prunes to the registered terms' buckets, one "
            "groupBy(doc, query) rollup — cost is Σ df over registered "
            "terms, never corpus × queries.",
            audit(
                __import__(
                    "sparksearch.query.percolate", fromlist=["percolate_indexed"]
                ).percolate_indexed(
                    dist, [(1, "batch scan", "or"), (2, "data window", "and")]
                )
            ),
        ),
        (
            "geo_distance query",
            "Haversine is codegen'd Catalyst trig over two double columns; "
            "the radius predicate and 3-column projection push into the "
            "scan; top-k is TakeOrderedAndProject.",
            audit(
                __import__("sparksearch.query.geo", fromlist=["geo_distance_topk"])
                .geo_distance_topk(
                    docs.withColumn("lat", (F.pmod(F.col("doc_id"), F.lit(160)) * 1.0) - 80)
                    .withColumn("lon", (F.pmod(F.col("doc_id"), F.lit(360)) * 1.0) - 180),
                    12.5, -33.25, 6000.0, 10,
                )
            ),
        ),
        (
            "has_child rollup (join field)",
            "Child scoring is the match query's own plan (broadcast df/"
            "gstats); the parent rollup adds ONE groupBy on parent_id; "
            "top-k parents via TakeOrderedAndProject.",
            audit(
                __import__("sparksearch.query.joinq", fromlist=["has_child_topk"])
                .has_child_topk(
                    __import__("sparksearch.ops.chunking", fromlist=["chunk_table"])
                    .chunk_table(docs, size=32),
                    "batch scan", 10,
                )
            ),
        ),
        (
            "_mget point lookup",
            "The id list pushes into the corpus scan as an `In` filter "
            "(row-group pruning, PushedFilters below); the ≤N found rows "
            "BROADCAST back into the request frame (broadcast-LEFT of a "
            "left outer join is unsupported and silently degrades to a "
            "corpus-wide sort-merge shuffle — the r4 plan defect; the "
            "broadcast side must be the found set).",
            audit(
                __import__("sparksearch.query.docs_api", fromlist=["mget"])
                .mget(docs, [42, 7, 999_999_999, 3])
            ),
        ),
        (
            "has_parent (join field, literal top-m broadcast)",
            "The broadcast side is a LITERAL frame of the top-m parents "
            "(TakeOrderedAndProject → driver collect of ≤m rows), never "
            "the parent query's full BM25 match set — a head-term parent "
            "query's match set is corpus-sized and broadcasting it OOMs "
            "at scale (r4 plan defect #3).",
            audit(
                __import__("sparksearch.query.joinq", fromlist=["has_parent_topk"])
                .has_parent_topk(
                    __import__("sparksearch.ops.chunking", fromlist=["chunk_table"])
                    .chunk_table(docs, size=32),
                    docs, "batch scan", 10,
                )
            ),
        ),
        (
            "query_string (full Lucene syntax, compiled)",
            "The parse tree compiles ONCE to shared matched/score "
            "expressions; the plan is one tokenize pass → per-leaf "
            "conditional aggregates in a single groupBy (leaf→term map is "
            "a literal) → codegen'd tree evaluation → "
            "TakeOrderedAndProject.  No per-clause corpus scans.",
            audit(
                __import__("sparksearch.query.qstring", fromlist=["query_string_topk"])
                .query_string_topk(
                    docs, '(batch OR scan) AND "table hash" -vector '
                    'source:src3^2', 10,
                )
            ),
        ),
        (
            "combined_fields (BM25F term-centric)",
            "One per-field-frame union → dl'/weighted-tf/score aggregates all "
            "keyed on doc_id — exchange count independent of field count; "
            "union df and global stats are broadcasts.",
            audit(
                __import__("sparksearch.query.combined", fromlist=["combined_fields_topk"])
                .combined_fields_topk(
                    docs.withColumn(
                        "title",
                        F.concat_ws(" ", F.slice(
                            __import__("sparksearch.analyze", fromlist=["tokens_col"])
                            .tokens_col("text"), 1, 4)),
                    ),
                    "batch scan", {"title": 2.0, "text": 1.0}, 10,
                )
            ),
        ),
        (
            "collapse inner_hits (top-n per group)",
            "Two windows over ONE scored frame, both PARTITIONED BY the "
            "collapse key — the sort stays distributed; the k-sized leader "
            "frame broadcasts back onto the ranked hits.",
            audit(
                rk.collapse_inner_hits(docs, "batch scan", "source", 5, 2)
            ),
        ),
        (
            "geo_polygon (unrolled ray cast)",
            "The even-odd crossing test is one branch-free codegen'd "
            "expression over (lat, lon) — filter pushes toward the scan, "
            "zero shuffles before the limit.",
            audit(
                __import__("sparksearch.query.geo", fromlist=["geo_polygon"])
                .geo_polygon(
                    docs.withColumn("lat", (F.pmod(F.col("doc_id"), F.lit(160)) * 1.0) - 80)
                    .withColumn("lon", (F.pmod(F.col("doc_id"), F.lit(360)) * 1.0) - 180),
                    [(-60.0, -150.0), (20.0, -120.0), (70.0, -30.0),
                     (0.0, -60.0), (-40.0, 10.0)], 15,
                )
            ),
        ),
        (
            "cumulative_cardinality (first-seen identity)",
            "One groupBy(value) for first-seen + a bucket-sized window "
            "cumsum — never the naive per-bucket distinct re-count "
            "(O(buckets × corpus)).",
            audit(
                ag.cumulative_cardinality_agg(events, "day")
            ),
        ),
        (
            "PQ ANN query (ADC over codes)",
            "The distance table is a LITERAL nested array; approximate "
            "distance = n_sub element_at terms over the 8-byte codes "
            "column — raw vectors are never scanned and no Python stage "
            "appears in the query plan (the encode kernel is build-only).",
            audit((lambda: (
                __import__("sparksearch.ops.pq", fromlist=["build_pq_index", "PqIndex"])
                .build_pq_index(
                    spark, emb,
                    os.path.join(tempfile.gettempdir(), "sparksearch_plan_pq"),
                    n_sub=16, k_codes=32,
                ).topk(
                    [float(x) for x in emb.filter("vec_id = 0")
                     .collect()[0]["embedding"]],
                    10, exclude_vec_id=0,
                )
            ))()),
        ),
        (
            "Index build stage A (tfrows lineage)",
            "Row-local tf (sort+RLE higher-order functions): the corpus-sized "
            "dataflow crosses ZERO wide exchanges — tokenize, tf, ids, and the "
            "hive-partitioned write are all map-side.",
            audit(
                __import__("sparksearch.index.build", fromlist=["tfrows_table"])
                .tfrows_table(
                    docs, "doc_id", "text",
                    __import__("pyspark.sql", fromlist=["Observation"]).Observation("audit"),
                    8, 16, 4,
                )
            ),
        ),
    ]
    out = [
        "# PLANS — physical-plan audit of the headline operators",
        "",
        "Generated by `tools/plan_audit.py` (re-run after plan-affecting",
        f"changes).  Corpus: `{sf}`.  Every claim below is extracted from",
        "`explain(\"formatted\")` output, not hand-written.  Note: plans under",
        "AQE are captured BEFORE execution, where codegen ids are sometimes",
        "not yet assigned — `codegen: False` on an AQE plan is inconclusive,",
        "`True` is definite.",
        "",
    ]
    for name, note, a in sections:
        out.append(fmt(name, note, a))
    md = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(md, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
