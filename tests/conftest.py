from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from app_dupfind_spark.config import DedupConfig  # noqa: E402
from app_dupfind_spark.fixtures import build_corpus, pages_df  # noqa: E402
from app_dupfind_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="app-dupfind-tests", master="local[8]", shuffle_partitions=8
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    return build_corpus(seed=42, scale=1)


@pytest.fixture(scope="session")
def pages(spark, corpus):
    df = pages_df(spark, corpus)
    df.persist()
    df.count()
    return df


@pytest.fixture(scope="session")
def cfg():
    return DedupConfig()
