import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


@pytest.fixture(scope="session")
def spark():
    from pdf_table_spark.spark.session import build_session
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = build_session("pdf_table_spark-tests", master="local[4]",
                      shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_root():
    from pdf_table_spark.fixtures.build import ensure_fixtures
    ensure_fixtures(FIXTURE_ROOT, ("0.001",))
    return FIXTURE_ROOT
