"""spark-submit entry point for the sparksearch engine.

North-rule ops parity: "the whole pipeline ships via spark-submit
--py-files with zero per-row Python".  Usage::

    # package the library (once)
    cd /root/repo && zip -r /tmp/sparksearch.zip sparksearch

    # build an index over a documents parquet/Iceberg table
    spark-submit --py-files /tmp/sparksearch.zip -m sparksearch.cli \
        build --input /data/documents --index /data/index \
        --id-col doc_id --text-col text [--resume]

    # query it
    spark-submit --py-files /tmp/sparksearch.zip -m sparksearch.cli \
        search --index /data/index --query "hello world" -k 10

    # training-data ops
    ... dedup --input /data/documents --output /data/dup_pairs
    ... stats --input /data/documents --output /data/quality

Replaces the reference's argparse driver
(``keyword_search/functions/argument_parser.py:7-136`` and
``keyword_search/__main__.py:29-59``) — same role, Spark-native surface.
When run without spark-submit it builds its own local session
(:mod:`sparksearch.session`).
"""

from __future__ import annotations

import argparse
import json
import sys


def _get_spark(args):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    from sparksearch.session import get_spark

    return get_spark("sparksearch-cli", cores=args.cores)


def cmd_build(args) -> int:
    from sparksearch.index.build import build_index

    spark = _get_spark(args)
    docs = spark.read.parquet(args.input)
    meta = build_index(
        spark,
        docs,
        args.index,
        id_col=args.id_col,
        text_col=args.text_col,
        analyzer=args.analyzer,
        fields=args.fields.split(",") if args.fields else None,
        n_segments=args.segments,
        n_buckets=args.buckets,
        n_units=args.units,
        resume=args.resume,
        keep_tfrows=not args.no_tfrows,
    )
    print(json.dumps(meta))
    return 0


def cmd_search(args) -> int:
    from sparksearch.query.topk import InvertedIndex

    spark = _get_spark(args)
    idx = InvertedIndex(spark, args.index)
    if args.operator != "or" or args.msm is not None:
        from sparksearch.query.matchq import match_search

        out = match_search(
            idx, args.query, args.k,
            operator=args.operator, minimum_should_match=args.msm,
        )
    else:
        out = idx.search(args.query, k=args.k, field=args.field)
    for r in out.collect():
        print(json.dumps({"doc_id": r["doc_id"], "score": round(r["score"], 4)}))
    return 0


def cmd_count(args) -> int:
    from sparksearch.query.matchq import match_count_indexed
    from sparksearch.query.topk import InvertedIndex

    spark = _get_spark(args)
    idx = InvertedIndex(spark, args.index)
    n = match_count_indexed(idx, args.query).collect()[0]["count"]
    print(json.dumps({"count": int(n)}))
    return 0


def cmd_upsert(args) -> int:
    from sparksearch.index.upsert import upsert_index

    spark = _get_spark(args)
    delta = spark.read.parquet(args.input)
    meta = upsert_index(
        spark, delta, args.index, id_col=args.id_col, text_col=args.text_col,
        mode=args.mode,
    )
    print(json.dumps(meta))
    return 0


def cmd_delete(args) -> int:
    """Incremental delete: ids from a parquet column or an explicit list."""
    from sparksearch.index.upsert import delete_docs

    spark = _get_spark(args)
    if args.ids:
        ids = [int(i) for i in args.ids.split(",")]
        meta = delete_docs(spark, args.index, ids)
    else:
        df = spark.read.parquet(args.input).select(args.id_col)
        meta = delete_docs(spark, args.index, df.withColumnRenamed(args.id_col, "doc_id"))
    print(json.dumps(meta))
    return 0


def cmd_compact(args) -> int:
    """Force-merge: renumber ordinals densely and repack every bucket."""
    from sparksearch.index.upsert import compact_index

    spark = _get_spark(args)
    print(json.dumps(compact_index(spark, args.index)))
    return 0


def cmd_alias(args) -> int:
    """Create or atomically swap an index alias (the _aliases analog)."""
    from sparksearch.index import admin

    if args.create:
        admin.create_alias(args.alias, args.index)
        gen = 0
    else:
        gen = admin.swap_alias(args.alias, args.index)
    print(json.dumps({"alias": args.alias, "index_dir": args.index, "gen": gen}))
    return 0


def cmd_index_stats(args) -> int:
    """GET /<index>/_stats analog: metadata + per-component bytes."""
    from sparksearch.index import admin

    print(json.dumps(admin.index_stats(args.index)))
    return 0


def cmd_stream_ingest(args) -> int:
    """Continuously ingest document file-drops into the index
    (availableNow: processes everything present, then exits)."""
    from sparksearch.streaming import read_docs_stream, stream_index_ingest

    spark = _get_spark(args)
    stream = read_docs_stream(spark, args.input, args.max_files_per_trigger)
    meta = stream_index_ingest(spark, stream, args.index)
    print(json.dumps(meta))
    return 0


def cmd_lexicon(args) -> int:
    """Materialize the term-dictionary sidecar (prefix/fuzzy/suggest/
    significant_text/mlt need term strings; the core index does not)."""
    from sparksearch.index.lexicon import build_lexicon

    spark = _get_spark(args)
    docs = spark.read.parquet(args.input)
    build_lexicon(spark, docs, args.index, text_col=args.text_col)
    from sparksearch.index.lexicon import read_lexicon

    print(json.dumps({"terms": read_lexicon(spark, args.index).count()}))
    return 0


def cmd_positions(args) -> int:
    """Materialize the positional-postings sidecar (index-resident
    phrase verification; Lucene DOCS_AND_FREQS_AND_POSITIONS analog)."""
    from sparksearch.index.positions import build_positions

    spark = _get_spark(args)
    docs = spark.read.parquet(args.input)
    build_positions(spark, docs, args.index, text_col=args.text_col)
    from sparksearch.index import manifest as mf

    meta = mf.read_meta(args.index)
    print(json.dumps({"positions_gen": meta["positions_gen"]}))
    return 0


def cmd_phrase(args) -> int:
    from sparksearch.query.phrase import match_phrase_indexed
    from sparksearch.query.topk import InvertedIndex

    spark = _get_spark(args)
    idx = InvertedIndex(spark, args.index)
    if getattr(args, "local", False):
        from sparksearch.index.positions import phrase_local

        pdf = phrase_local(idx, args.query, args.k)
        for _, did, score in pdf.itertuples():
            print(json.dumps({"doc_id": int(did), "score": float(score)}))
        return 0
    if args.positional:
        from sparksearch.index.positions import match_phrase_positional

        hits = match_phrase_positional(idx, args.query, args.k)
    else:
        if not args.input:
            print("phrase: --input is required without --positional",
                  file=sys.stderr)
            return 2
        docs = spark.read.parquet(args.input)
        hits = match_phrase_indexed(idx, docs, args.query, args.k)
    for r in hits.collect():
        print(json.dumps({"doc_id": r["doc_id"], "score": r["score"]}))
    return 0


def cmd_suggest(args) -> int:
    from sparksearch.query.suggest import term_suggest_indexed
    from sparksearch.query.topk import InvertedIndex

    spark = _get_spark(args)
    idx = InvertedIndex(spark, args.index)
    for r in term_suggest_indexed(idx, args.query, args.size).collect():
        print(json.dumps(r.asDict()))
    return 0


def cmd_mlt(args) -> int:
    from sparksearch.query.mlt import more_like_this_indexed
    from sparksearch.query.topk import InvertedIndex

    spark = _get_spark(args)
    idx = InvertedIndex(spark, args.index)
    for r in more_like_this_indexed(idx, args.like, args.k).collect():
        print(json.dumps({"doc_id": r["doc_id"], "score": r["score"]}))
    return 0


def cmd_dedup(args) -> int:
    from sparksearch.ops.dedup import minhash_lsh_pairs

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    spark = _get_spark(args)
    docs = spark.read.parquet(args.input)
    pairs = minhash_lsh_pairs(docs, threshold=args.threshold)
    obs = Observation("dedup_out")
    pairs.observe(obs, F.count(F.lit(1)).alias("n")).write.mode("overwrite").parquet(
        args.output
    )  # count rides the write — no second job
    print(json.dumps({"pairs": int(obs.get["n"] or 0)}))
    return 0


def cmd_stats(args) -> int:
    from sparksearch.ops.textstats import fingerprints, langid, quality_scores

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    spark = _get_spark(args)
    docs = spark.read.parquet(args.input)
    out = (
        quality_scores(docs)
        .join(langid(docs), "doc_id")
        .join(fingerprints(docs), "doc_id")
    )
    obs = Observation("stats_out")
    out.observe(obs, F.count(F.lit(1)).alias("n")).write.mode("overwrite").parquet(
        args.output
    )
    print(json.dumps({"rows": int(obs.get["n"] or 0)}))
    return 0


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sparksearch", description=__doc__)
    p.add_argument("--cores", type=int, default=None, help="local[N] when not under spark-submit")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build a BM25 inverted index")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--id-col", default="doc_id")
    b.add_argument("--text-col", default="text")
    # default None = derive from corpus size (build.auto_layout)
    b.add_argument("--segments", type=int, default=None)
    b.add_argument("--buckets", type=int, default=None)
    b.add_argument("--units", type=int, default=None)
    b.add_argument("--resume", action="store_true")
    b.add_argument("--analyzer", default="ascii", choices=["ascii", "unicode"])
    b.add_argument("--fields", help="comma-separated field columns (multi-field index)")
    b.add_argument("--no-tfrows", action="store_true",
                   help="drop the tfrows copy after pack (halves the index; "
                        "mutations reconstruct rows from postings decode)")
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search", help="BM25 top-k query")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--field", default=None, help="field of a multi-field index")
    s.add_argument("--operator", default="or", choices=("or", "and"),
                   help="match operator (and = every term required)")
    s.add_argument("--msm", type=int, default=None,
                   help="minimum_should_match (distinct matched terms)")
    s.set_defaults(fn=cmd_search)

    cn = sub.add_parser("count", help="_count: match-set size from the index")
    cn.add_argument("--index", required=True)
    cn.add_argument("--query", required=True)
    cn.set_defaults(fn=cmd_count)

    u = sub.add_parser("upsert", help="incremental doc_as_upsert into an index")
    u.add_argument("--input", required=True, help="delta documents parquet")
    u.add_argument("--index", required=True)
    u.add_argument("--id-col", default="doc_id")
    u.add_argument("--text-col", default="text")
    u.add_argument("--mode", default="auto", choices=["auto", "merge", "delta"],
                   help="merge in place vs generational delta segment")
    u.set_defaults(fn=cmd_upsert)

    dl = sub.add_parser("delete", help="incrementally remove doc ids from an index")
    dl.add_argument("--index", required=True)
    dl.add_argument("--input", help="parquet with an id column of docs to remove")
    dl.add_argument("--ids", help="comma-separated doc ids (alternative to --input)")
    dl.add_argument("--id-col", default="doc_id")
    dl.set_defaults(fn=cmd_delete)

    c = sub.add_parser("compact", help="force-merge: dense ordinals + full repack")
    c.add_argument("--index", required=True)
    c.set_defaults(fn=cmd_compact)

    al = sub.add_parser("alias", help="create/swap an index alias (atomic pointer)")
    al.add_argument("--alias", required=True, help="alias file path")
    al.add_argument("--index", required=True, help="target index dir")
    al.add_argument("--create", action="store_true", help="create instead of swap")
    al.set_defaults(fn=cmd_alias)

    ist = sub.add_parser("index-stats", help="_stats analog: meta + component bytes")
    ist.add_argument("--index", required=True)
    ist.set_defaults(fn=cmd_index_stats)

    si = sub.add_parser("stream-ingest", help="stream document file-drops into an index")
    si.add_argument("--input", required=True, help="directory watched for parquet drops")
    si.add_argument("--index", required=True)
    si.add_argument("--max-files-per-trigger", type=int, default=4)
    si.set_defaults(fn=cmd_stream_ingest)

    lx = sub.add_parser("lexicon", help="build the term-dictionary sidecar")
    lx.add_argument("--input", required=True, help="the indexed documents parquet")
    lx.add_argument("--index", required=True)
    lx.add_argument("--text-col", default="text")
    lx.set_defaults(fn=cmd_lexicon)

    px = sub.add_parser(
        "positions", help="build the positional-postings sidecar"
    )
    px.add_argument("--input", required=True, help="the indexed documents parquet")
    px.add_argument("--index", required=True)
    px.add_argument("--text-col", default="text")
    px.set_defaults(fn=cmd_positions)

    ph = sub.add_parser("phrase", help="match_phrase top-k (positional verification)")
    ph.add_argument("--index", required=True)
    ph.add_argument("--input", help="the indexed documents parquet (candidate-verification path)")
    ph.add_argument("--query", required=True)
    ph.add_argument("-k", type=int, default=10)
    ph.add_argument(
        "--positional", action="store_true",
        help="verify from the positions/ sidecar (no corpus read)",
    )
    ph.add_argument(
        "--local", action="store_true",
        help="driver-native positional path (no Spark job under budget)",
    )
    ph.set_defaults(fn=cmd_phrase)

    sg = sub.add_parser("suggest", help="term suggester (needs the lexicon sidecar)")
    sg.add_argument("--index", required=True)
    sg.add_argument("--query", required=True)
    sg.add_argument("--size", type=int, default=5)
    sg.set_defaults(fn=cmd_suggest)

    ml = sub.add_parser("mlt", help="more_like_this (needs tfrows + lexicon)")
    ml.add_argument("--index", required=True)
    ml.add_argument("--like", type=int, required=True, help="doc_id of the input doc")
    ml.add_argument("-k", type=int, default=10)
    ml.set_defaults(fn=cmd_mlt)

    d = sub.add_parser("dedup", help="MinHash+LSH near-dup pairs")
    d.add_argument("--input", required=True)
    d.add_argument("--output", required=True)
    d.add_argument("--threshold", type=float, default=0.8)
    d.set_defaults(fn=cmd_dedup)

    t = sub.add_parser("stats", help="quality/langid/fingerprint table")
    t.add_argument("--input", required=True)
    t.add_argument("--output", required=True)
    t.set_defaults(fn=cmd_stats)
    return p


def main(argv: list[str] | None = None) -> int:
    args = make_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
