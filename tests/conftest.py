import os
import sys

import pytest

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_DIR = os.path.dirname(_TESTS_DIR)
sys.path.insert(0, _REPO_DIR)

# Spark python workers must be able to import test modules (functions defined
# in tests are cloudpickled by reference); extend PYTHONPATH before the JVM
# and worker daemons start.
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in [_TESTS_DIR, _REPO_DIR, os.environ.get("PYTHONPATH", "")] if p
)

from warp_pipes_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Oracles that embed data-derived literals (q47's IVF centroids) must be
# generated for the SAME sf the harness queries run at. The driver compares
# at sf0.01 (the queries.py default); the local harness re-points generation
# at its own sf dir before warp_pipes_spark.queries is first imported.
os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="warp-pipes-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
