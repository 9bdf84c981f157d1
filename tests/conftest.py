import pytest

from kbase_cdm_ontologies_spark.session import get_spark
from kbase_cdm_ontologies_spark.sources.corpus import (
    CorpusSpec,
    corpus_to_spark,
    generate_corpus,
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def corpus():
    return generate_corpus(CorpusSpec(seed=42, n_pages=400))


@pytest.fixture(scope="session")
def corpus_dfs(spark, corpus):
    pages, stmts, alias = corpus_to_spark(spark, corpus)
    return dict(pages=pages.cache(), statements=stmts.cache(), alias=alias.cache())
