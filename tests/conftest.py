from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iyp_spark.session import get_spark  # noqa: E402
from iyp_spark.store import GraphStore  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("iyp_spark_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def lake_root():
    d = tempfile.mkdtemp(prefix="iyp_lake_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def store(spark, lake_root):
    return GraphStore(spark, lake_root)


@pytest.fixture(scope="session")
def corpus(store):
    """Fixture corpus written once per test session."""
    from iyp_spark.fixtures import write_corpus

    n = write_corpus(store, scale=0.3)
    return n
