import pytest

from decisions_knowledge_graph_data_spark.session import get_spark
from decisions_knowledge_graph_data_spark.sources.corpus import (
    corpus_tables,
    gen_registry,
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kg-tests", parallelism=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def registry():
    return gen_registry()


@pytest.fixture(scope="session")
def corpus20(spark, registry):
    """t1 smoke corpus: 20 docs + goldens (FIXTURES.md §7)."""
    tables, bundle, reg = corpus_tables(spark, 20, registry)
    return tables, bundle, reg
