"""K2/T6 debug sink: file-per-article with sanitized-title names."""

from sparksearch.ops.debug_sink import write_article_files


def test_write_article_files(spark, tmp_path):
    docs = spark.createDataFrame(
        [("a b/c", "hello world"), ("x y", "second doc"), ("skip", None)],
        "url string, text string",
    )
    out = tmp_path / "arts"
    write_article_files(docs, str(out), title_col="url")
    assert (out / "a_b-c").read_text() == "a b/c\nhello world"
    assert (out / "x_y").read_text() == "x y\nsecond doc"
    assert len(list(out.iterdir())) == 2  # null-text doc skipped
