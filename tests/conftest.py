import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparksearch.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="sparksearch-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus(spark):
    """Small deterministic corpus shared across tests (en, text column)."""
    from sparksearch.pipeline import prepare_corpus
    from sparksearch.synth import generate_docs

    docs = generate_docs(spark, 400, seed=42, vocab_size=2000)
    c = prepare_corpus(docs, lang="en", use_html=False).cache()
    c.count()
    return c


@pytest.fixture(scope="session")
def built_index(spark, corpus, tmp_path_factory):
    from sparksearch.pipeline import build_and_load

    d = str(tmp_path_factory.mktemp("idx") / "index")
    return build_and_load(
        spark, corpus, d, n_segments=8, n_buckets=8, n_units=2
    )
