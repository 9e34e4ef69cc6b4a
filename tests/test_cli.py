"""CLI surface: build → search → upsert → dedup → stats end-to-end."""

import json

from pyspark.sql import functions as F

from sparksearch.cli import main
from sparksearch.synth import make_vocab


def test_cli_end_to_end(spark, corpus, tmp_path, capsys):
    src = str(tmp_path / "docs")
    corpus.write.mode("overwrite").parquet(src)
    idx = str(tmp_path / "idx")
    assert main(["build", "--input", src, "--index", idx,
                 "--segments", "4", "--buckets", "8", "--units", "2"]) == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["n_docs"] == corpus.count()

    v = make_vocab(100)
    assert main(["search", "--index", idx, "--query", f"{v[0]} {v[5]}", "-k", "5"]) == 0
    hits = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert hits and all("doc_id" in h and "score" in h for h in hits)

    delta_src = str(tmp_path / "delta")
    corpus.limit(20).withColumn(
        "text", F.concat(F.lit("updated revision "), F.col("text"))
    ).write.mode("overwrite").parquet(delta_src)
    assert main(["upsert", "--input", delta_src, "--index", idx]) == 0
    meta2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta2["n_docs"] == meta["n_docs"]  # replaced, not added

    # incremental delete by explicit ids: n_docs drops by exactly 2
    two = [r["doc_id"] for r in corpus.limit(2).collect()]
    assert main(["delete", "--index", idx, "--ids", f"{two[0]},{two[1]}"]) == 0
    meta3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta3["n_docs"] == meta["n_docs"] - 2

    # compact after the mutations: meta unchanged, still searchable
    assert main(["compact", "--index", idx]) == 0
    meta4 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta4["n_docs"] == meta3["n_docs"]
    assert main(["search", "--index", idx, "--query", f"{v[0]} {v[5]}", "-k", "3"]) == 0
    assert capsys.readouterr().out.strip()

    out1 = str(tmp_path / "pairs")
    assert main(["dedup", "--input", src, "--output", out1, "--threshold", "0.5"]) == 0
    assert "pairs" in json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    out2 = str(tmp_path / "stats")
    assert main(["stats", "--input", src, "--output", out2]) == 0
    n = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"]
    assert n == corpus.count()

    # query-DSL surface: lexicon → suggest / mlt / phrase
    assert main(["lexicon", "--input", src, "--index", idx]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["terms"] > 0
    assert main(["suggest", "--index", idx, "--query", v[50][:-1] + "x"]) == 0
    sug = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert sug and all("suggestion" in s for s in sug)
    like = [r["doc_id"] for r in corpus.limit(3).collect()][-1]
    assert main(["mlt", "--index", idx, "--like", str(like)]) == 0
    # phrase over the same corpus (any bigram from a real doc)
    t0 = corpus.select("text").first()[0].split()[:2]
    assert main(["phrase", "--index", idx, "--input", src,
                 "--query", " ".join(t0)]) == 0
    capsys.readouterr()
    # positional sidecar must be built from the CURRENT corpus state
    # (the index was upserted + 2 docs deleted above) — reconstruct it
    cur = (
        corpus.filter(~F.col("doc_id").isin(two))
        .join(spark.read.parquet(delta_src).select("doc_id"), "doc_id", "left_anti")
        .unionByName(
            spark.read.parquet(delta_src).filter(~F.col("doc_id").isin(two))
        )
    )
    cur_src = str(tmp_path / "docs_cur")
    cur.write.mode("overwrite").parquet(cur_src)
    assert main(["phrase", "--index", idx, "--input", cur_src,
                 "--query", " ".join(t0)]) == 0
    exh = capsys.readouterr().out.strip()
    assert main(["positions", "--input", cur_src, "--index", idx]) == 0
    assert "positions_gen" in capsys.readouterr().out
    assert main(["phrase", "--index", idx, "--query", " ".join(t0),
                 "--positional"]) == 0
    assert capsys.readouterr().out.strip() == exh
    # driver-native path: identical output again, no Spark job under budget
    assert main(["phrase", "--index", idx, "--query", " ".join(t0),
                 "--local"]) == 0
    assert capsys.readouterr().out.strip() == exh
    # without --positional, --input is required
    assert main(["phrase", "--index", idx, "--query", "x"]) == 2
