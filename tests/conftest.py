from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM light


@pytest.fixture(scope="session")
def spark():
    from job_searchengine_project_spark.session import get_spark

    s = get_spark(app_name="tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def webpages_small(spark):
    """Shared 300-doc corpus, cached for the whole test session."""
    from job_searchengine_project_spark.corpus import generate_webpages

    df = generate_webpages(spark, n_docs=300, vocab_size=500, seed=42).cache()
    df.count()
    return df
